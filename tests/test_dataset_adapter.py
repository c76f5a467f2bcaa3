"""Directory-dataset adapter: the nicr-scene-analysis-datasets sample
interface the reference consumes (reference testing/dataset.py:9-61) —
loading, key contract, config label lists, attached preprocessor,
DataLoader integration, and auto-skip for missing data."""
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'mini_dataset')


def _dataset(**kwargs):
    from nicr_mtsa_tpu.data.dataset import DirectoryRGBDDataset
    if not DirectoryRGBDDataset.is_available(FIXTURE):
        pytest.skip('mini_dataset fixture missing '
                    '(scripts/make_dataset_fixture.py)')
    return DirectoryRGBDDataset(FIXTURE, **kwargs)


def test_config_label_lists():
    ds = _dataset(split='train')
    cfg = ds.config
    assert cfg.semantic_label_list[0].name == 'void'
    assert len(cfg.semantic_label_list) == 11
    assert len(cfg.semantic_label_list_without_void) == 10
    # reference accessor surface (tests/test_merge.py:30)
    is_thing = cfg.semantic_label_list.classes_is_thing
    assert is_thing[0] is False and any(is_thing)
    assert (cfg.semantic_label_list_without_void.classes_is_thing
            == is_thing[1:])
    assert len(cfg.semantic_label_list.classes_colors) == 11
    assert cfg.depth_mean > 0 and cfg.depth_std > 0


def test_sample_key_contract():
    ds = _dataset(split='train')
    assert len(ds) == 4
    s = ds[0]
    assert s['rgb'].dtype == np.uint8 and s['rgb'].shape == (120, 160, 3)
    assert s['depth'].dtype == np.uint16 and s['depth'].shape == (120, 160)
    assert s['semantic'].shape == (120, 160)
    assert s['instance'].dtype == np.uint16
    assert isinstance(s['scene'], int)
    assert s['identifier'] == ('train', '0000')
    # orientations: OrientationDict {instance_id: rad}, collate-ignored
    from nicr_mtsa_tpu.data._types import OrientationDict
    assert isinstance(s['orientations'], OrientationDict)
    for k, v in s['orientations'].items():
        assert isinstance(k, int) and 0.0 <= v <= 2 * np.pi
    # every annotated instance is a thing pixel region
    assert set(np.unique(s['instance'])) - {0} == set(
        s['orientations'].keys())


def test_sample_keys_filtering():
    ds = _dataset(split='train', sample_keys=('rgb', 'semantic'))
    s = ds[1]
    assert set(s.keys()) == {'identifier', 'rgb', 'semantic'}


def test_split_separation():
    train = _dataset(split='train')
    valid = _dataset(split='valid')
    assert len(train) == len(valid) == 4
    assert train[0]['identifier'] != valid[0]['identifier']
    with pytest.raises(FileNotFoundError):
        _dataset(split='nope')


def test_preprocessor_applied_in_getitem():
    # the reference attaches the preprocessor to the dataset
    # (tests/test_metrics.py:60); samples come out preprocessed
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, NormalizeRGB, Resize,
    )
    ds = _dataset(split='train')
    ds.preprocessor = Compose([Resize(height=60, width=80),
                               NormalizeRGB()])
    s = ds[0]
    assert s['rgb'].shape == (60, 80, 3)
    assert s['rgb'].dtype == np.float32


def test_dataloader_end_to_end():
    from nicr_mtsa_tpu.data.loader import DataLoader
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, InstanceClearStuffIDs, InstanceTargetGenerator,
        NormalizeDepth, NormalizeRGB, PanopticTargetGenerator, Resize,
        ToDeviceArrays,
    )
    ds = _dataset(split='valid')
    is_thing = ds.config.semantic_label_list.classes_is_thing
    ds.preprocessor = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=is_thing),
        Resize(height=96, width=128),
        InstanceTargetGenerator(sigma=8,
                                semantic_classes_is_thing=is_thing),
        PanopticTargetGenerator(semantic_classes_is_thing=is_thing),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=ds.config.depth_mean,
                       depth_std=ds.config.depth_std, raw_depth=True),
        ToDeviceArrays(),
    ])
    batches = list(DataLoader(ds, batch_size=2, num_workers=2))
    assert len(batches) == 2
    b = batches[0]
    assert b['rgb'].shape == (2, 96, 128, 3)
    assert b['instance_center'].shape[0] == 2
    assert b['panoptic'].shape == (2, 96, 128)
    assert np.isfinite(np.asarray(b['rgb'])).all()


def test_missing_path_raises():
    from nicr_mtsa_tpu.data.dataset import (
        DirectoryRGBDDataset, get_dataset,
    )
    assert not DirectoryRGBDDataset.is_available('/does/not/exist')
    assert not DirectoryRGBDDataset.is_available(None)
    with pytest.raises(FileNotFoundError):
        get_dataset('/does/not/exist', split='train')


def test_image_roundtrip_formats(tmp_path):
    from nicr_mtsa_tpu.data.dataset import _read_image, _write_image
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (7, 9, 3), dtype=np.uint8)
    u16 = rng.integers(0, 2 ** 16 - 1, (7, 9), dtype=np.uint16)
    f32 = rng.normal(size=(7, 9, 2)).astype(np.float32)
    for arr, name in ((u8, 'a.png'), (u16, 'b.png'), (f32, 'c.npy')):
        p = str(tmp_path / name)
        _write_image(p, arr)
        back = _read_image(p)
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == arr.dtype
