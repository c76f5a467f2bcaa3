"""Pallas TPU kernel for offset-vote pixel grouping.

The XLA formulation of nearest-center assignment materializes a
(B, H*W, K) distance tensor in HBM (~GBs at 480x640, B=8, K=64) and
re-reads it for the argmin -- measured ~60 ms inside the fused
inference program. This kernel streams pixel tiles through VMEM in
their native (8, 128) f32 layout and loops over the centers (scalars
in SMEM): for each center j the squared distance is a pure
elementwise op on the tile, and a running (min_d2, argmin) pair stays
in registers. No relayouts, no HBM intermediates; traffic is exactly
inputs + outputs.

Tie-breaking matches torch.min / jnp.argmin: strict `<` updates keep
the FIRST minimal center index."""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANES = 128
SUB = 64
TILE_P = SUB * LANES      # pixels per grid step
_BIG = 3.4e38


def _make_kernel(n_centers: int):
    def _kernel(cy_ref, cx_ref, loc_y_ref, loc_x_ref, fg_ref,
                ids_ref, mind2_ref):
        ly = loc_y_ref[0, 0]                   # (SUB, LANES)
        lx = loc_x_ref[0, 0]

        def body(j, carry):
            min_d2, arg = carry
            dy = ly - cy_ref[0, 0, j]
            dx = lx - cx_ref[0, 0, j]
            d2 = dy * dy + dx * dx
            better = d2 < min_d2
            return (jnp.where(better, d2, min_d2),
                    jnp.where(better, j, arg))

        # arg starts at -1: invalid centers sit at +BIG so their d2
        # overflows to inf and never beats the BIG init -- a pixel only
        # gets arg >= 0 if some VALID center exists, so `arg + 1` is
        # already 0 (background) when there are no valid centers and no
        # host-side any_valid epilogue is needed
        init = (jnp.full((SUB, LANES), _BIG, jnp.float32),
                jnp.full((SUB, LANES), -1, jnp.int32))
        min_d2, arg = jax.lax.fori_loop(0, n_centers, body, init)

        fg = fg_ref[0, 0]
        # +1: instance ids start at 1; 0 = background
        ids_ref[0, 0] = jnp.where(fg != 0, arg + 1, 0)
        mind2_ref[0, 0] = min_d2
    return _kernel


def group_pixels_pallas(
    loc_y: jnp.ndarray,      # (B, P) float32: pixel y + offset y
    loc_x: jnp.ndarray,      # (B, P) float32
    centers_yx: jnp.ndarray,  # (B, K, 2) float32
    centers_valid: jnp.ndarray,  # (B, K) bool
    foreground: jnp.ndarray,     # (B, P) bool
    interpret: bool = False,
):
    """Return (ids (B, P) int32 in [0, K], min_d2 (B, P) float32)."""
    B, P = loc_y.shape
    K = centers_yx.shape[1]

    # invalid centers at +BIG: they never win while any real center
    # exists (and a padded-id win implies no valid centers at all)
    cy = jnp.where(centers_valid, centers_yx[..., 0].astype(jnp.float32),
                   _BIG)
    cx = jnp.where(centers_valid, centers_yx[..., 1].astype(jnp.float32),
                   _BIG)

    # pad pixels to a tile multiple and fold into (B, R, SUB, LANES)
    P_pad = -(-P // TILE_P) * TILE_P
    if P_pad != P:
        padding = ((0, 0), (0, P_pad - P))
        loc_y = jnp.pad(loc_y, padding)
        loc_x = jnp.pad(loc_x, padding)
        foreground = jnp.pad(foreground, padding)
    R = P_pad // TILE_P

    def fold(x):
        return x.reshape(B, R, SUB, LANES)

    grid = (B, R)
    pix_spec = pl.BlockSpec((1, 1, SUB, LANES), lambda b, r: (b, r, 0, 0),
                            memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((1, 1, K), lambda b, r: (b, 0, 0),
                            memory_space=pltpu.SMEM)

    ids, mind2 = pl.pallas_call(
        _make_kernel(K),
        grid=grid,
        in_specs=[ctr_spec, ctr_spec, pix_spec, pix_spec, pix_spec],
        out_specs=(pix_spec, pix_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, R, SUB, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(cy[:, None, :], cx[:, None, :],
      fold(loc_y.astype(jnp.float32)), fold(loc_x.astype(jnp.float32)),
      fold(foreground.astype(jnp.int32)))

    ids = ids.reshape(B, P_pad)[:, :P]
    mind2 = mind2.reshape(B, P_pad)[:, :P]
    return ids, mind2
