"""Pallas TPU kernel for the PQ intersection-area matrix.

`ops.segments.intersection_matrix` computes the (S_gt+1, S_pred+1)
pixel-count matrix per image as `onehot(gt)^T @ onehot(pred)`. The XLA
formulation materializes both (B, P, S) one-hot tensors in HBM
(~7.5 GB at the eval bench shape, and the reason the fused eval step
OOMs beyond batch 32). This kernel builds the one-hots per pixel tile
in VMEM (iota-compare), feeds them straight to the MXU, and
accumulates the (S_gt+1, S_pred+1) product in the output block across
pixel tiles (the classic reduction-grid pattern: the pixel-tile axis
maps every step to the same output block; the first visit initializes
it). HBM traffic is exactly the two (B, P) int32 slot maps plus the
tiny output.

Counts are exact: bf16 one-hot entries are 0/1 and the dot accumulates
in f32 (`preferred_element_type`), exact below 2^24 pixels per pair.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(R: int, n_gt_pad: int, n_pred_pad: int):
    def _kernel(gt_ref, pred_ref, out_ref):
        pt = pl.program_id(1)

        def onehot(ref, n_pad):
            # (R, 128) int32 slots -> (R*128, n_pad) bf16 one-hot:
            # pixels on sublanes, bins on lanes
            slots = ref[0][:, :, None]                    # (R, 128, 1)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (R, 128, n_pad), 2)
            oh = (slots == iota).astype(jnp.bfloat16)
            return oh.reshape(R * 128, n_pad)

        oh_gt = onehot(gt_ref, n_gt_pad)
        oh_pred = onehot(pred_ref, n_pred_pad)

        tile = jax.lax.dot_general(
            oh_gt, oh_pred, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (n_gt_pad, n_pred_pad)

        @pl.when(pt == 0)
        def _init():
            out_ref[0] = tile

        @pl.when(pt != 0)
        def _acc():
            out_ref[0] += tile

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=('n_gt', 'n_pred', 'block_p',
                                    'interpret'))
def intersection_matrix_pallas(
    gt_slots: jnp.ndarray,     # (B, P) int32 in [0, n_gt]
    pred_slots: jnp.ndarray,   # (B, P) int32 in [0, n_pred]
    n_gt: int,
    n_pred: int,
    block_p: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n_gt+1, n_pred+1) float32 == ops.segments.intersection_matrix.

    Requires P % block_p == 0 (callers pad or fall back)."""
    B, P = gt_slots.shape
    assert P % block_p == 0 and block_p % 1024 == 0, (P, block_p)
    # pad one-hot widths to lane multiples for clean MXU tiles
    n_gt_pad = max(128, -(-(n_gt + 1) // 128) * 128)
    n_pred_pad = max(128, -(-(n_pred + 1) // 128) * 128)

    R = block_p // 128
    gt3 = gt_slots.astype(jnp.int32).reshape(B, P // 128, 128)
    pred3 = pred_slots.astype(jnp.int32).reshape(B, P // 128, 128)

    grid = (B, P // block_p)
    out = pl.pallas_call(
        _make_kernel(R, n_gt_pad, n_pred_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_gt_pad, n_pred_pad),
                               lambda b, pt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_gt_pad, n_pred_pad),
                                       jnp.float32),
        interpret=interpret,
    )(gt3, pred3)
    return out[:, :n_gt + 1, :n_pred + 1]
