"""Dense biternion orientation targets.

Produces, for every annotated instance whose (majority-vote) semantic
class is orientation-relevant, a two-channel (cos, sin) image plus a
foreground mask and the dict of contributing orientations. Mirrors the
behavior of reference ``data/preprocessing/orientation.py:17-97`` but is
fully vectorized: one ``np.unique(return_inverse)`` pass yields per-pixel
instance slots, the class vote becomes a joint (instance, class)
histogram, and the dense images are single LUT gathers — there is no
per-instance python loop over masks.
"""
from typing import Any, Dict, Tuple, Union

import numpy as np

from ...types import SampleType
from .._types import OrientationDict
from .base import PreprocessingBase
from .utils import _keys_available


def _majority_class_per_slot(slot_img: np.ndarray,
                             semantic: np.ndarray,
                             n_slots: int) -> np.ndarray:
    """Most frequent semantic class within each instance slot.

    Ties resolve to the smallest class id (argmax over a bincount), the
    same rule the reference applies per-mask; instances may straddle
    class borders when merged from 3D boxes, hence the vote.
    """
    n_classes = int(semantic.max()) + 1 if semantic.size else 1
    joint = np.bincount(
        slot_img.ravel().astype(np.int64) * n_classes
        + semantic.ravel().astype(np.int64),
        minlength=n_slots * n_classes,
    ).reshape(n_slots, n_classes)
    return joint.argmax(axis=1)


class OrientationTargetGenerator(PreprocessingBase):
    """Encode per-instance orientations as dense (cos, sin) images."""

    def __init__(
        self,
        semantic_classes_estimate_orientation: Union[Tuple[bool, ...],
                                                     None] = None,
        multiscale_processing: bool = True,
    ) -> None:
        if semantic_classes_estimate_orientation is None:
            self._orientation_class_ids = None
        else:
            self._orientation_class_ids = np.flatnonzero(
                semantic_classes_estimate_orientation)
        super().__init__(
            fixed_parameters={
                'semantic_classes': self._orientation_class_ids,
            },
            multiscale_processing=multiscale_processing,
        )

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        required = ('instance', 'orientations', 'semantic')
        if not _keys_available(sample, required):
            # inference samples / multiscale entries without instance GT
            return sample, {}

        instance = sample['instance']
        annotated = sample['orientations']

        ids, inverse = np.unique(instance, return_inverse=True)
        slot_img = inverse.reshape(instance.shape)

        # per-slot eligibility: real instance (id != 0) with an annotation
        eligible = np.array(
            [bool(i) and i in annotated for i in ids], dtype=bool)
        if self._orientation_class_ids is not None and eligible.any():
            voted = _majority_class_per_slot(
                slot_img, sample['semantic'], len(ids))
            eligible &= np.isin(voted, self._orientation_class_ids)

        # biternion LUT over slots; ineligible slots encode to zeros
        angles = np.array(
            [annotated.get(i, 0.0) if keep else 0.0
             for i, keep in zip(ids, eligible)], dtype=np.float32)
        lut = np.stack([np.cos(angles), np.sin(angles)],
                       axis=-1).astype(np.float32)
        lut[~eligible] = 0.0

        sample['orientation'] = lut[slot_img]
        sample['orientation_foreground'] = eligible[slot_img]
        sample['orientations_present'] = OrientationDict(
            (i, annotated[i]) for i, keep in zip(ids, eligible) if keep)
        return sample, {}
