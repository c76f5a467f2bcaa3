"""Tensor parallelism over a ('data', 'model') 2D mesh.

The reference has no parallelism at all (SURVEY.md §2.8); data
parallelism (mesh.py/train.py) is the right first axis for these
model sizes. This module adds the optional `model` axis for the
widest MLP pairs -- Megatron-style:

- fc1 kernels shard over their OUTPUT features (column parallel),
- the matching fc2 kernels shard over their INPUT features (row
  parallel),

so the hidden activations between them stay sharded on `model` and
the only collective per MLP is the psum XLA inserts after fc2. With
GSPMD there is no hand-written collective code: parameters are
placed with `NamedSharding`s and the partitioner propagates.

Coverage (complete, by design): Swin block MLPs (`mlp_fc1`/`mlp_fc2`,
hidden = 4C up to 4096 for swin-b stage 4) -- the only layers in the
library with a Megatron-shaped expansion pair wide enough to shard.

Evaluated and DE-SCOPED (round 3):
- Attention qkv/proj: the qkv projection is a single FUSED (C, 3C)
  kernel whose contiguous `model` chunks straddle the q/k/v (and
  head) boundaries, so column-sharding it forces a reshard at the
  `qkv[..., :C]` splits; and the production attention is a Pallas
  custom call, which the SPMD partitioner replicates around anyway.
  Head-parallel attention would need per-tensor q/k/v parameters and
  an attention kernel invoked under shard_map -- real engineering for
  a layer whose activations (<= (Bw, 64, 1024) bf16) fit a single
  chip at every supported batch size.
- Conv channels (ResNet blocks, decoder modules): widest channel dim
  is 512; sharding a 3x3 conv pair over `model` trades one psum for
  BN-state resharding between the convs at widths where the MXU is
  already underfed. Data parallelism dominates for every model in
  BENCH_CONFIGS (they fit on one chip with batch >= 256).

The SegFormer-style decoder MLPs have no fc1/fc2 expansion pair
(embed -> upsample -> concat -> fuse), so MLP TP does not apply there.

Forward/gradient equality vs the replicated run is tested on the
virtual CPU mesh (tests/test_parallel.py); the driver's
dryrun_multichip exercises the ('data', 'model') mesh end to end."""
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (fc1 name, fc2 name) pairs whose hidden dimension shards on 'model'
_MLP_PAIRS = (('mlp_fc1', 'mlp_fc2'),)


def make_2d_mesh(n_data: int, n_model: int) -> Mesh:
    devices = jax.devices()
    assert len(devices) >= n_data * n_model, (
        f'need {n_data * n_model} devices, have {len(devices)}')
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ('data', 'model'))


def _spec_for(path: Tuple[str, ...], leaf, n_model: int) -> P:
    """PartitionSpec for one parameter leaf by its tree path."""
    names = [getattr(k, 'key', str(k)) for k in path]
    for fc1, fc2 in _MLP_PAIRS:
        if fc1 in names:
            # kernel (in, hidden) -> column parallel; bias (hidden,)
            dim = leaf.ndim - 1
            if leaf.shape[dim] % n_model == 0:
                return P(*([None] * dim + ['model']))
        if fc2 in names:
            if leaf.ndim == 2 and leaf.shape[0] % n_model == 0:
                return P('model', None)     # kernel (hidden, out)
            return P()                      # bias (out,): replicated
    return P()


def tp_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings mirroring `params` (Megatron MLP
    rules above, everything else replicated over `model`)."""
    n_model = mesh.shape['model']

    def spec(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, n_model))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_for_tp(params, mesh: Mesh):
    """Place parameters on the mesh with the TP shardings (replicated
    over 'data', MLP pairs split over 'model')."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh))
