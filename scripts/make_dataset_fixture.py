"""Generate the checked-in mini dataset fixture
(tests/fixtures/mini_dataset): 4 deterministic 120x160 RGB-D samples
in the directory layout documented in nicr_mtsa_tpu/data/dataset.py.

Run from the repo root:  python scripts/make_dataset_fixture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from nicr_mtsa_tpu.data._types import OrientationDict          # noqa: E402
from nicr_mtsa_tpu.data.dataset import (                       # noqa: E402
    DatasetConfig, SemanticLabel, SemanticLabelList,
    write_directory_dataset,
)

H, W = 120, 160
N_CLASSES_WITH_VOID = 11
THING_IDS = (1, 2, 3)


def make_config() -> DatasetConfig:
    rng = np.random.default_rng(7)
    labels = [SemanticLabel('void')]
    for i in range(1, N_CLASSES_WITH_VOID):
        labels.append(SemanticLabel(
            name=f'class_{i}',
            is_thing=i in THING_IDS,
            use_orientation=i in THING_IDS,
            color=tuple(int(v) for v in rng.integers(0, 255, 3)),
        ))
    return DatasetConfig(
        semantic_label_list=SemanticLabelList(labels),
        scene_label_list=('void', 'office', 'kitchen', 'bedroom'),
        depth_mean=8000.0,
        depth_std=4000.0,
        depth_mode='raw',
    )


def make_sample(idx: int):
    rng = np.random.default_rng(5000 + idx)
    rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depth = rng.integers(1, 2 ** 14, (H, W), dtype=np.uint16)
    semantic = np.full((H, W), 4 + (idx % 3), dtype=np.uint8)
    instance = np.zeros((H, W), dtype=np.uint16)
    orientations = OrientationDict()
    for i in range(1, int(rng.integers(2, 5))):
        bh = int(rng.integers(H // 6, H // 3))
        bw = int(rng.integers(W // 6, W // 3))
        y = int(rng.integers(0, H - bh))
        x = int(rng.integers(0, W - bw))
        semantic[y:y + bh, x:x + bw] = int(rng.choice(THING_IDS))
        instance[y:y + bh, x:x + bw] = i
        orientations[i] = float(rng.uniform(0, 2 * np.pi))
    return {
        'rgb': rgb, 'depth': depth, 'semantic': semantic,
        'instance': instance, 'orientations': orientations,
        'scene': 1 + (idx % 3),
    }


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), '..',
                       'tests', 'fixtures', 'mini_dataset')
    config = make_config()
    for split, ids in (('train', range(4)), ('valid', range(4, 8))):
        write_directory_dataset(
            out, split, [make_sample(i) for i in ids], config)
    print(f'wrote fixture to {os.path.abspath(out)}')


if __name__ == '__main__':
    main()
