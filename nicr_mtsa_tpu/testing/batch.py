"""Random synthetic batches with exact Panoptic-DeepLab encodings.

Counterpart of the reference `generate_random_batch`
(tests/test_instance_postprocessing.py:26-73): rectangular instances
with hand-computed center/offset encodings, used for the
encode -> postprocess -> PQ round-trip tests.
"""
from typing import Dict, Tuple

import numpy as np

from ..data.preprocessing.base import APPLIED_PREPROCESSING_KEY
from ..data.preprocessing.instance import InstanceTargetGenerator
from ..data.preprocessing.panoptic import PanopticTargetGenerator
from ..data._collate import mt_collate
from ..data._types import AppliedPreprocessingMeta


def build_dummy_batch(
    batch_size: int = 2,
    height: int = 120,
    width: int = 160,
    n_instances: int = 4,
    n_classes_with_void: int = 9,
    thing_class_ids: Tuple[int, ...] = (1, 2, 3),
    sigma: int = 8,
    seed: int = 0,
    normalized_offset: bool = True,
) -> Dict:
    """Create a collated batch of samples with random rectangular
    instances plus exact instance/panoptic target encodings."""
    rng = np.random.default_rng(seed)
    is_thing = tuple(
        i in thing_class_ids for i in range(n_classes_with_void)
    )
    stuff_ids = [i for i in range(1, n_classes_with_void)
                 if i not in thing_class_ids]

    inst_gen = InstanceTargetGenerator(
        sigma=sigma,
        semantic_classes_is_thing=is_thing,
        normalized_offset=normalized_offset,
    )
    pan_gen = PanopticTargetGenerator(semantic_classes_is_thing=is_thing)

    samples = []
    for _ in range(batch_size):
        semantic = np.zeros((height, width), dtype='uint16')
        instance = np.zeros((height, width), dtype='uint16')

        # background stuff region
        semantic[:, :] = stuff_ids[0] if stuff_ids else 0

        for i in range(1, n_instances + 1):
            h = int(rng.integers(12, height // 2))
            w = int(rng.integers(12, width // 2))
            y = int(rng.integers(0, height - h))
            x = int(rng.integers(0, width - w))
            cls = int(rng.choice(thing_class_ids))
            semantic[y:y + h, x:x + w] = cls
            instance[y:y + h, x:x + w] = i

        sample = {
            'rgb': rng.integers(0, 255, (height, width, 3), dtype=np.uint8),
            'depth': rng.integers(1, 5000, (height, width),
                                  dtype=np.uint16),
            'semantic': semantic,
            'instance': instance,
            APPLIED_PREPROCESSING_KEY: AppliedPreprocessingMeta(),
        }
        sample = inst_gen(sample)
        sample = pan_gen(sample)
        samples.append(sample)

    return mt_collate(samples)
