"""Smoke tests for the runnable examples (each a subprocess on the CPU
backend): the multi-chip serving example over an 8-virtual-device mesh
(the v5e-8 deployment shape), synthetic training with checkpointing and
CSV logging, and single-image inference with PNG visualization output.
These pin the end-user entry points the library-level tests bypass."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, 'examples')


def _run(script, *args, timeout=900):
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    return subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env)


def test_serve_sharded_example():
    res = _run('serve_sharded.py', '--cpu', '--devices', '8',
               '--size', '64', '96', '--batch-per-device', '1')
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'over 8 devices' in res.stdout
    assert 'frames/s total' in res.stdout


def test_infer_panoptic_example(tmp_path):
    res = _run('infer_panoptic.py', '--cpu', '--out', str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    for name in ('panoptic.png', 'semantic.png', 'depth.png'):
        assert (tmp_path / name).stat().st_size > 0


def test_eval_dataset_example():
    res = _run('eval_dataset.py', '--cpu',
               '--dataset', os.path.join(REPO, 'tests', 'fixtures',
                                         'mini_dataset'),
               '--split', 'valid', '--batch-size', '2',
               '--size', '96', '128')
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'evaluated' in res.stdout
    assert 'miou' in res.stdout


def test_train_synthetic_example(tmp_path):
    res = _run('train_synthetic.py', '--cpu', '--epochs', '1',
               '--steps', '2', '--batch-size', '2',
               '--size', '64', '96', '--out', str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'done; log at' in res.stdout
    assert (tmp_path / 'log.csv').exists()
