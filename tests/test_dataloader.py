"""Data-loader + sampler tests (reference tests/test_sampler.py:14-112:
determinism incl. multi-worker loaders)."""
import numpy as np

from nicr_mtsa_tpu.data import mt_collate, RandomSamplerSubset
from nicr_mtsa_tpu.data.loader import DataLoader
from nicr_mtsa_tpu.testing.dataset import get_dataloader, get_dataset


def test_sampler_subset_sizes():
    ds = list(range(100))
    sampler = RandomSamplerSubset(ds, subset=0.2, deterministic=True)
    assert len(sampler) == 20
    indices = list(iter(sampler))
    assert len(indices) == 20
    assert len(set(indices)) == 20


def test_sampler_deterministic_subset():
    ds = list(range(50))
    s1 = RandomSamplerSubset(ds, subset=0.3, deterministic=True)
    s2 = RandomSamplerSubset(ds, subset=0.3, deterministic=True)
    # same subset (set equality), shuffled order
    assert set(iter(s1)) == set(iter(s2))


def test_sampler_concat_fractions():
    class Concat:
        def __init__(self, datasets):
            self.datasets = datasets

        def __len__(self):
            return sum(len(d) for d in self.datasets)

    concat = Concat([list(range(40)), list(range(60))])
    sampler = RandomSamplerSubset(concat, subset=[0.5, 0.1],
                                  deterministic=True)
    assert len(sampler) == 20 + 6
    indices = list(iter(sampler))
    from_first = [i for i in indices if i < 40]
    from_second = [i for i in indices if i >= 40]
    assert len(from_first) == 20
    assert len(from_second) == 6


def test_dataloader_workers_match_serial():
    ds = get_dataset(n_samples=8, height=32, width=48)
    serial = list(DataLoader(ds, batch_size=4, num_workers=0))
    threaded = list(DataLoader(ds, batch_size=4, num_workers=3))
    assert len(serial) == len(threaded) == 2
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a['rgb'], b['rgb'])
        np.testing.assert_array_equal(a['instance'], b['instance'])


def test_dataloader_drop_last_and_len():
    ds = get_dataset(n_samples=10, height=16, width=16)
    dl = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(dl) == 2
    assert sum(1 for _ in dl) == 2
    dl2 = DataLoader(ds, batch_size=4, drop_last=False)
    assert len(dl2) == 3
    batches = list(dl2)
    assert batches[-1]['rgb'].shape[0] == 2


def test_dataloader_with_preprocessing_and_subset():
    from nicr_mtsa_tpu.data.preprocessing import Compose, Resize
    ds = get_dataset(preprocessor=Compose([Resize(height=24, width=32)]),
                     n_samples=10, height=48, width=64)
    dl = get_dataloader(ds, batch_size=2, subset=0.4, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]['rgb'].shape == (2, 24, 32, 3)


def test_dataloader_worker_error_propagates():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError('boom')

    dl = DataLoader(Bad(), batch_size=2, num_workers=2)
    try:
        list(dl)
        assert False, 'expected error'
    except RuntimeError as e:
        assert 'boom' in str(e)


# --- host->device prefetcher (data/feeder.py) -----------------------------

def test_prefetch_to_device_order_and_values():
    from nicr_mtsa_tpu.data import prefetch_to_device

    batches = [{'x': np.full((8, 4), i, np.float32),
                's': np.int32(i)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b['x']),
                                      batches[i]['x'])
        assert int(b['s']) == i


def test_prefetch_to_device_size_one_and_empty():
    from nicr_mtsa_tpu.data import prefetch_to_device

    assert list(prefetch_to_device(iter([]), size=2)) == []
    batches = [{'x': np.ones((2, 2), np.float32)}]
    out = list(prefetch_to_device(iter(batches), size=1))
    assert len(out) == 1
    try:
        list(prefetch_to_device(iter(batches), size=0))
        assert False, 'expected ValueError'
    except ValueError:
        pass


def test_prefetch_sharded_over_mesh():
    from nicr_mtsa_tpu.data import batch_shardings, prefetch_to_device
    from nicr_mtsa_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    chooser = batch_shardings(mesh)
    batches = [{
        'x': np.arange(16 * 3, dtype=np.float32).reshape(16, 3) + i,
        'scalar': np.float32(3.0 + i),
        'ragged': np.zeros((3, 2), np.float32),   # 3 % 8 != 0
    } for i in range(3)]
    out = list(prefetch_to_device(batches, size=2, sharding=chooser))
    assert len(out) == 3
    # batch-major leaf scattered over all 8 devices of the data axis
    assert len(out[0]['x'].sharding.device_set) == 8
    # scalar and ragged leaves replicated
    assert out[0]['scalar'].sharding.is_fully_replicated
    assert out[0]['ragged'].sharding.is_fully_replicated
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b['x']),
                                      batches[i]['x'])


def test_prefetch_single_sharding_object():
    import jax
    from nicr_mtsa_tpu.data import prefetch_to_device
    from nicr_mtsa_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    batches = [{'x': np.ones((8, 2), np.float32) * i} for i in range(2)]
    out = list(prefetch_to_device(batches, size=2, sharding=sharding))
    assert len(out[1]['x'].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out[1]['x']),
                                  batches[1]['x'])
