"""Mesh / sharding unit tests (SURVEY.md §2.8: the reference delegates
DP to an external DDP/NCCL trainer; here it's first-class via
jax.sharding). Runs on the 8-device virtual CPU mesh from conftest."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nicr_mtsa_tpu.parallel import make_mesh, replicate, shard_batch
from nicr_mtsa_tpu.parallel.mesh import batch_sharding, replicated


def test_make_mesh_shape_and_axes():
    mesh = make_mesh(8)
    assert mesh.shape == {'data': 8}
    mesh2 = make_mesh(4, axis_names=('data', 'model'), mesh_shape=(2, 2))
    assert mesh2.shape == {'data': 2, 'model': 2}


def test_shard_batch_and_replicate_placement():
    mesh = make_mesh(8)
    batch = {'rgb': np.zeros((8, 4, 4, 3), np.float32),
             'nested': {'scene': np.zeros((8,), np.int32)}}
    sharded = shard_batch(batch, mesh)
    assert sharded['rgb'].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=4)
    assert sharded['nested']['scene'].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=1)
    # each shard holds 1 of the 8 rows
    shard0 = sharded['rgb'].addressable_shards[0]
    assert shard0.data.shape == (1, 4, 4, 3)

    params = {'w': np.ones((3, 3), np.float32)}
    repl = replicate(params, mesh)
    assert repl['w'].sharding.is_equivalent_to(replicated(mesh), ndim=2)
    assert repl['w'].addressable_shards[0].data.shape == (3, 3)


def test_sharded_sum_matches_single_device():
    """A jitted reduction over a data-sharded array must equal the
    unsharded result (XLA inserts the cross-device psum)."""
    mesh = make_mesh(8)
    x = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    xs = jax.device_put(x, batch_sharding(mesh))

    f = jax.jit(lambda a: jnp.sum(a * a),
                in_shardings=batch_sharding(mesh),
                out_shardings=replicated(mesh))
    np.testing.assert_allclose(float(f(xs)), float(np.sum(x * x)),
                               rtol=1e-6)


def test_dryrun_multichip_four_devices():
    """The driver's multi-chip dryrun on a 4-device sub-mesh: full
    train step (forward, losses, grads, update) with sharded batch."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(4)
