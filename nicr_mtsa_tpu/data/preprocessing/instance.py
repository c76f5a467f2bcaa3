"""Panoptic-DeepLab instance target encoding (host-side numpy).

Re-implements the behavior of reference data/preprocessing/instance.py:

- `InstanceClearStuffIDs` (instance.py:19-94): force instance id 0 on
  all stuff/void pixels so each stuff class is one segment.
- `InstanceTargetGenerator` (instance.py:97-286): per-instance
  Gaussian center heatmap (size 6*sigma+3 kernel, center 3*sigma+1),
  2-channel offset-to-center image (optionally normalized by H/W),
  `instance_foreground`, and `instance_center_mask` (foreground plus
  stuff so stray predicted centers in stuff regions are penalized).
  The semantic class of an instance is the majority vote over its
  pixels; instances whose majority class is stuff are skipped.

Unlike the reference's per-instance python loop over masks, the
offset/foreground computation here is vectorized with
`np.unique(return_inverse)` + `bincount` segment reductions; only the
bounded Gaussian splat (a (6*sigma+3)^2 patch per instance) remains a
loop.
"""
from typing import Any, Dict, Tuple, Union

import numpy as np

from ...types import SampleType
from .base import PreprocessingBase
from .resize import get_fullres
from .utils import _keys_available


def _thing_stuff_ids_from_sample(sample, use_meta):
    """Derive (thing_ids, stuff_ids_without_void) from per-sample meta."""
    if not use_meta:
        return None, None
    classes_is_thing = np.array(
        sample['meta']['semantic_label_list'].classes_is_thing
    )
    classes_is_stuff = np.logical_not(classes_is_thing)
    thing_ids = np.where(classes_is_thing)[0]
    stuff_ids = np.where(classes_is_stuff)[0][1:]   # remove void
    return thing_ids, stuff_ids


class InstanceClearStuffIDs(PreprocessingBase):
    """Zero the instance id on every stuff/void pixel.

    Downstream target generation and panoptic encoding treat id 0 as
    "no instance"; any stray instance annotation on a stuff class (3D
    box spill-over in some datasets) would otherwise create phantom
    thing segments.
    """

    def __init__(
        self,
        semantic_classes_is_thing: Union[None, Tuple[bool, ...]] = None,
        use_is_thing_from_meta: bool = False,
        multiscale_processing: bool = True,
        disable_stats: bool = False,
    ) -> None:
        if semantic_classes_is_thing is None:
            self._stuff_class_ids = None
        else:
            assert not use_is_thing_from_meta
            # void counts as stuff here: it must not carry instances
            self._stuff_class_ids = np.flatnonzero(
                ~np.asarray(semantic_classes_is_thing))
        self._with_stats = not disable_stats
        self._use_is_thing_from_meta = use_is_thing_from_meta
        super().__init__(
            fixed_parameters=dict(
                use_is_thing_from_meta=use_is_thing_from_meta,
                disable_stats=disable_stats,
            ),
            multiscale_processing=multiscale_processing,
        )

    def _resolve_stuff_ids(self, sample: SampleType):
        if self._stuff_class_ids is not None:
            return self._stuff_class_ids
        if not self._use_is_thing_from_meta:
            return None
        is_thing = sample['meta']['semantic_label_list'].classes_is_thing
        return np.flatnonzero(~np.asarray(is_thing))

    def _preprocess(
        self, sample: SampleType, **kwargs
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if not _keys_available(sample, ('instance', 'semantic')):
            return sample, {}

        stuff_ids = self._resolve_stuff_ids(sample)
        on_stuff = np.isin(sample['semantic'], stuff_ids)

        dynamic: Dict[str, Any] = {'stuff_semantic_classes': stuff_ids}
        if self._with_stats:
            cleared_ids, n_pixels = np.unique(
                sample['instance'][on_stuff], return_counts=True)
            dynamic['cleared_instance_pixels'] = \
                dict(zip(cleared_ids, n_pixels))

        sample['instance'][on_stuff] = 0
        return sample, dynamic


def _gaussian_patch(sigma: int) -> np.ndarray:
    """(6*sigma+3)^2 Gaussian splat patch, peak 1.0 at the center pixel
    (3*sigma+1, 3*sigma+1) -- the Panoptic-DeepLab center encoding."""
    c = 3 * sigma + 1
    dy, dx = np.ogrid[-c:c + 1, -c:c + 1]
    return np.exp((dy * dy + dx * dx) / (-2.0 * sigma * sigma))


class InstanceTargetGenerator(PreprocessingBase):
    def __init__(
        self,
        sigma: int,
        semantic_classes_is_thing: Union[Tuple[bool, ...], None] = None,
        use_is_thing_from_meta: bool = False,
        sigma_for_additional_downscales: Union[Dict[int, int], None] = None,
        normalized_offset: bool = True,
        multiscale_processing: bool = False,
    ) -> None:
        # sigma keyed by downscale; None = the main (full working) scale
        self._sigma_by_scale = {None: sigma}
        self._sigma_by_scale.update(sigma_for_additional_downscales or {})
        self._gauss_by_scale = {k: _gaussian_patch(s)
                                for k, s in self._sigma_by_scale.items()}

        self._thing_class_ids = None
        self._stuff_class_ids = None
        if semantic_classes_is_thing is not None:
            assert not use_is_thing_from_meta
            is_thing = np.asarray(semantic_classes_is_thing, dtype=bool)
            self._thing_class_ids = np.flatnonzero(is_thing)
            self._stuff_class_ids = np.flatnonzero(~is_thing)[1:]  # -void
        self._use_is_thing_from_meta = use_is_thing_from_meta
        self._normalized_offset = normalized_offset

        super().__init__(
            multiscale_processing=sigma_for_additional_downscales is not None,
            fixed_parameters=dict(
                sigma_for_downscales=self._sigma_by_scale,
                normalized_offset=normalized_offset,
                use_is_thing_from_meta=use_is_thing_from_meta))

    def _preprocess(
        self,
        sample: SampleType,
        downscale=None,
        **kwargs,
    ) -> Tuple[SampleType, Dict[str, Any]]:
        if 'instance' not in sample:
            return sample, {}

        instance_image = sample['instance']
        height, width = instance_image.shape
        gauss = self._gauss_by_scale[downscale]
        sigma = self._sigma_by_scale[downscale]

        if self._use_is_thing_from_meta:
            thing_class_ids, stuff_class_ids = \
                _thing_stuff_ids_from_sample(sample, True)
        else:
            thing_class_ids = self._thing_class_ids
            stuff_class_ids = self._stuff_class_ids

        # segment decomposition: ids sorted ascending; inverse maps each
        # pixel to its id slot
        ids, inverse = np.unique(instance_image, return_inverse=True)
        inverse = inverse.reshape(height, width)
        n_seg = len(ids)

        counts = np.bincount(inverse.ravel(), minlength=n_seg)

        # per-segment majority semantic class (ties -> smallest class id,
        # matching np.bincount().argmax() in the reference)
        if thing_class_ids is not None and 'semantic' in sample:
            sem = np.asarray(sample['semantic'])
            n_classes = int(sem.max()) + 1
            hist = np.bincount(
                inverse.ravel() * n_classes + sem.ravel().astype(np.int64),
                minlength=n_seg * n_classes,
            ).reshape(n_seg, n_classes)
            majority_class = hist.argmax(axis=1)
            is_thing_seg = np.isin(majority_class, thing_class_ids)
        else:
            is_thing_seg = np.ones(n_seg, dtype=bool)

        # id 0 means "no instance"
        is_instance_seg = (ids != 0) & is_thing_seg

        encoded_instances = [int(i) for i in ids[(ids != 0) & is_thing_seg]]
        skipped_instances_due_to_stuff = \
            [int(i) for i in ids[(ids != 0) & ~is_thing_seg]]

        # per-segment center = int(mean(y)), int(mean(x)) (truncation
        # matches the reference's int() casts, instance.py:225-226)
        yy, xx = np.meshgrid(np.arange(height), np.arange(width),
                             indexing='ij')
        sum_y = np.bincount(inverse.ravel(), weights=yy.ravel(),
                            minlength=n_seg)
        sum_x = np.bincount(inverse.ravel(), weights=xx.ravel(),
                            minlength=n_seg)
        safe_counts = np.maximum(counts, 1)
        center_y = (sum_y / safe_counts).astype(np.int64)
        center_x = (sum_x / safe_counts).astype(np.int64)

        # foreground + offsets (vectorized gather over the segment table)
        fg_per_seg = is_instance_seg
        foreground = fg_per_seg[inverse]

        offset_img = np.zeros((height, width, 2), dtype='int16')
        off_y = center_y[inverse] - yy
        off_x = center_x[inverse] - xx
        offset_img[..., 0] = np.where(foreground, off_y, 0)
        offset_img[..., 1] = np.where(foreground, off_x, 0)

        # center heatmap: bounded Gaussian splat per encoded instance.
        # The patch covers rows/cols center +- (3*sigma+1), clipped to
        # the image; overlapping splats combine with max.
        center_img = np.zeros((height, width), dtype='float32')
        reach = 3 * sigma + 1
        for seg_idx in np.nonzero(is_instance_seg)[0]:
            cy, cx = int(center_y[seg_idx]), int(center_x[seg_idx])
            y0, y1 = max(cy - reach, 0), min(cy + reach + 1, height)
            x0, x1 = max(cx - reach, 0), min(cx + reach + 1, width)
            if y0 >= y1 or x0 >= x1:
                continue          # center splatted fully off-image
            py, px = y0 - (cy - reach), x0 - (cx - reach)
            patch = gauss[py:py + (y1 - y0), px:px + (x1 - x0)]
            np.maximum(center_img[y0:y1, x0:x1], patch,
                       out=center_img[y0:y1, x0:x1])

        if self._normalized_offset:
            offset_img = offset_img.astype('float32')
            offset_img[..., 0] /= height
            offset_img[..., 1] /= width

        # all non-foreground pixels must carry instance id 0; otherwise
        # InstanceClearStuffIDs is missing from the pipeline
        assert not instance_image[~foreground].any()
        instance_fullres = get_fullres(sample, 'instance')
        if instance_fullres is not None and 'semantic' in sample:
            semantic_fullres = get_fullres(sample, 'semantic')
            if semantic_fullres is not None:
                fullres_fg = np.isin(semantic_fullres, thing_class_ids)
                assert not instance_fullres[~fullres_fg].any()

        # the center-mask is foreground plus stuff: a predicted center
        # inside a stuff region must still be penalized by the MSE loss
        center_mask = foreground.copy()
        if stuff_class_ids is not None and 'semantic' in sample:
            center_mask |= np.isin(sample['semantic'], stuff_class_ids)

        sample['instance_center'] = center_img
        sample['instance_offset'] = offset_img
        sample['instance_foreground'] = foreground
        sample['instance_center_mask'] = center_mask

        dynamic = dict(
            encoded_instances=encoded_instances,
            skipped_instances_due_to_stuff=skipped_instances_due_to_stuff,
            thing_semantic_classes=thing_class_ids,
            stuff_semantic_classes=stuff_class_ids)
        return sample, dynamic
