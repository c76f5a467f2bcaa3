"""Fused crop + 2-tap bilinear resize + argmax/max-softmax reduction.

The fused eval step derives full-resolution semantic predictions by
cropping the working-resolution logits to the valid region, resizing
bilinearly (reference model/postprocessing/dense_base.py:14-58 via
F.interpolate), and reducing over classes (semantic.py:37-80). The XLA
formulation (models/upsampling.py resized_channel_reduce) decomposes
the resize into p_h * p_w strided-slice phase chains; at the B128 eval
shape ((128, 480, 640, 40) -> (512, 512), 64 phases) those chains plus
their f32 temporaries measure ~150 ms/step and four ~800 MB HBM
buffers (the eval B256 OOM driver, PERF.md).

This kernel computes the whole chain per output tile in VMEM:

- Input is the conv-produced logits transposed to (H, W, C, B) -- a
  BITCAST under XLA's batch-minor conv layout (PERF.md lesson 6), so
  batch rides the 128 lanes.
- Output tiles are aligned to the 2-tap periodicity (tile rows = a
  multiple of p_h phases <-> q_h source rows), so every in-tile tap
  row/column offset is STATIC; only the tile's source start is
  dynamic (clamped at image borders for the out-of-range first/last
  taps, reproducing `_tap_slice`'s edge semantics).
- Per output row: one 2-tap row lerp in f32 (skipped when the weight
  is 0, like `h_phase`); per output pixel: a 2-tap column lerp and the
  class reduction (first-argmax via the arithmetic-penalty trick,
  score = 1 / sum(exp(l - max))).

The argmax is BIT-IDENTICAL to reducing
resize_bilinear(crop(x).astype(f32)): same taps, same cast points,
same lerp operation order (h then w). The score agrees to ~1 ulp (the
XLA twin computes exp(max - logsumexp) = 1/sum(exp(l - max)) through
log/exp rounding).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.upsampling import _two_tap_plan


def _pick_block(p: int, g: int, target: int, align: int = 1):
    """Largest k with k | g, k * p <= target, and (k * p) % align == 0
    (0 when no such k exists)."""
    k = max(1, target // p)
    while k >= 1:
        if g % k == 0 and (k * p) % align == 0:
            return k
        k -= 1
    return 0


def _tile_rows(i0, k, p):
    return int(i0[k * p - 1]) + 2 - int(i0[0])


def _plan_blocks(in_h, in_w, out_h, out_w, C, B, itemsize,
                 interpret=False):
    """Shared block-size selection for the call and the support gate:
    (k_h, k_w, n_rows, n_cols) or None when no in-bounds, VMEM-fitting
    periodic tiling exists. The output block is (Ho, Wo, block_b):
    Mosaic requires its second-to-last dim Wo to be 8-aligned (or the
    whole axis) on real TPUs -- interpret mode skips that constraint."""
    w_align = 1 if interpret else 8
    i0h, fh, g_h, q_h, p_h, per_h = _two_tap_plan(in_h, out_h)
    i0w, fw, g_w, q_w, p_w, per_w = _two_tap_plan(in_w, out_w)
    if (out_h != in_h and not per_h) or (out_w != in_w and not per_w):
        return None
    if p_h > 32 or p_w > 16:
        return None
    k_h = _pick_block(p_h, g_h, 32)
    # shrink until the tile (incl. tap halo) fits inside the input
    while k_h > 1 and _tile_rows(i0h, k_h, p_h) > in_h:
        k_h = _pick_block(p_h, g_h, k_h * p_h - 1)
    k_w = _pick_block(p_w, g_w, 16, w_align)
    while k_w > 1 and _tile_rows(i0w, k_w, p_w) > in_w:
        nk = _pick_block(p_w, g_w, k_w * p_w - 1, w_align)
        if not nk:
            break
        k_w = nk
    if not k_h or not k_w:
        return None
    n_rows = _tile_rows(i0h, k_h, p_h)
    n_cols = _tile_rows(i0w, k_w, p_w)
    if n_rows > in_h or n_cols > in_w:
        return None

    # VMEM tile budget (scratch is the input dtype): shrink blocks
    # until the tile fits
    def over():
        return (n_rows * n_cols * C * min(128, B) * itemsize
                > 8 * 1024 * 1024)
    while over() and (k_w > 1 or k_h > 1):
        if k_w > 1 and _pick_block(p_w, g_w, k_w * p_w - 1, w_align):
            k_w = _pick_block(p_w, g_w, k_w * p_w - 1, w_align)
            n_cols = _tile_rows(i0w, k_w, p_w)
        elif k_h > 1:
            k_h = _pick_block(p_h, g_h, k_h * p_h - 1)
            n_rows = _tile_rows(i0h, k_h, p_h)
        else:
            break
    if over():
        return None
    return k_h, k_w, n_rows, n_cols


def _make_kernel(plan_h, plan_w, Ho, Wo, n_rows, n_cols, C,
                 crop_y0, crop_x0, in_h, in_w, rows_pb, cols_pb,
                 full_batch=False):
    i0h, fh = plan_h
    i0w, fw = plan_w
    i0h_min, i0w_min = int(i0h[0]), int(i0w[0])

    def _kernel(x_hbm, idx_ref, score_ref, x_vmem, sem):
        ib = pl.program_id(0)
        ih = pl.program_id(1)
        iw = pl.program_id(2)
        Bt = x_vmem.shape[-1]

        # Border handling: the tile is DMA'd from a clamped start and
        # then, on border tiles only, shifted in place so that local
        # index j always holds (clamped) source row base + j. After
        # the fix-up every tap index in the hot loop is STATIC (Mosaic
        # has no dynamic_slice on values, and dynamic ref indexing
        # measures slow). Out-of-range taps exist only at image edges
        # (i0 = -1 / i0 + 1 = n, _two_tap_params clamps), so the
        # shifts are by exactly one and the vacated edge entry keeps
        # the duplicated edge value -- which IS the clamp semantics.
        base_r = ih * rows_pb + i0h_min + crop_y0
        start_r = jnp.clip(base_r, crop_y0, crop_y0 + in_h - n_rows)
        delta_r = base_r - start_r                      # -1, 0, or 1
        base_c = iw * cols_pb + i0w_min + crop_x0
        start_c = jnp.clip(base_c, crop_x0, crop_x0 + in_w - n_cols)
        delta_c = base_c - start_c

        # a lane-dim (batch) slice must be 128-aligned under Mosaic's
        # tiling; a whole-axis remainder block (< 128 lanes) therefore
        # indexes the full axis instead of a dynamic zero-length slice
        batch_ix = slice(None) if full_batch else pl.ds(ib * Bt, Bt)
        copy = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_r, n_rows), pl.ds(start_c, n_cols),
                     slice(None), batch_ix],
            x_vmem, sem)
        copy.start()
        copy.wait()

        @pl.when(delta_r < 0)
        def _():
            # first row tile: local j must read old j-1 (edge dup at 0)
            for j in range(n_rows - 1, 0, -1):
                x_vmem[j] = x_vmem[j - 1]

        @pl.when(delta_r > 0)
        def _():
            # last row tile: local j must read old j+1 (edge dup at end)
            for j in range(n_rows - 1):
                x_vmem[j] = x_vmem[j + 1]

        @pl.when(delta_c < 0)
        def _():
            for j in range(n_cols - 1, 0, -1):
                x_vmem[:, j] = x_vmem[:, j - 1]

        @pl.when(delta_c > 0)
        def _():
            for j in range(n_cols - 1):
                x_vmem[:, j] = x_vmem[:, j + 1]

        iota = jax.lax.broadcasted_iota(
            jnp.int32, (C, Bt), 0).astype(jnp.float32)

        def out_row(r):
            lo = int(i0h[r]) - i0h_min
            w_r = float(fh[r])
            a = x_vmem[lo].astype(jnp.float32)       # (n_cols, C, Bt)
            if w_r == 0.0:
                hrow = a
            else:
                b = x_vmem[lo + 1].astype(jnp.float32)
                hrow = a * (1.0 - w_r) + b * w_r

            idx_cols = []
            score_cols = []
            for v in range(Wo):
                clo = int(i0w[v]) - i0w_min
                w_c = float(fw[v])
                av = hrow[clo]                        # (C, Bt)
                if w_c == 0.0:
                    l = av
                else:
                    bv = hrow[clo + 1]
                    l = av * (1.0 - w_c) + bv * w_c
                m = jnp.max(l, axis=0, keepdims=True)
                mb = jnp.broadcast_to(m, l.shape)
                pen = (l < mb).astype(jnp.float32)
                idx = jnp.min(iota + C * pen, axis=0)     # (Bt,)
                s = jnp.sum(jnp.exp(l - mb), axis=0)
                idx_cols.append(idx.astype(jnp.int32)[None])
                score_cols.append((1.0 / s)[None])
            idx_ref[r] = jnp.concatenate(idx_cols, axis=0)
            score_ref[r] = jnp.concatenate(score_cols, axis=0)

        for r in range(Ho):
            out_row(r)

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=('crop_y0', 'crop_x0', 'in_h', 'in_w',
                     'out_h', 'out_w', 'block_b', 'interpret'))
def _resize_reduce_call(xt, crop_y0, crop_x0, in_h, in_w,
                        out_h, out_w, block_b, interpret):
    H, W, C, B = xt.shape
    i0h, fh, g_h, q_h, p_h, _ = _two_tap_plan(in_h, out_h)
    i0w, fw, g_w, q_w, p_w, _ = _two_tap_plan(in_w, out_w)

    k_h, k_w, n_rows, n_cols = _plan_blocks(
        in_h, in_w, out_h, out_w, C, B, xt.dtype.itemsize,
        interpret=interpret)
    Ho, Wo = k_h * p_h, k_w * p_w
    rows_pb, cols_pb = k_h * q_h, k_w * q_w

    grid = (B // block_b, out_h // Ho, out_w // Wo)
    out_spec = pl.BlockSpec((Ho, Wo, block_b),
                            lambda ib, ih, iw: (ih, iw, ib),
                            memory_space=pltpu.VMEM)

    idx_t, score_t = pl.pallas_call(
        _make_kernel((i0h, fh), (i0w, fw), Ho, Wo, n_rows, n_cols, C,
                     crop_y0, crop_x0, in_h, in_w, rows_pb, cols_pb,
                     full_batch=(block_b == B)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((out_h, out_w, B), jnp.int32),
            jax.ShapeDtypeStruct((out_h, out_w, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rows, n_cols, C, block_b), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt)
    return idx_t, score_t


def crop_resize_argmax_score(
    x: jnp.ndarray,            # (B, H, W, C) logits (bf16/f32)
    crop_slices,               # (slice_y, slice_x) static valid region
    out_h: int,
    out_w: int,
    *,
    interpret: bool = False,
):
    """(first-argmax idx int32, max-softmax score f32), both
    (B, out_h, out_w), of crop(x) bilinearly resized (half-pixel
    2-tap, torch align_corners=False semantics) -- without the
    resized (or even the cropped) logits tensor ever existing in HBM.

    Argmax is bit-identical to reducing
    resize_bilinear(crop.astype(f32), out_h, out_w); score to ~1 ulp.
    Use `resize_reduce_supported` to check shape constraints; callers
    fall back to models.upsampling.resized_channel_reduce otherwise.
    """
    B, H, W, C = x.shape
    sy, sx = crop_slices
    crop_y0, crop_y1, _ = sy.indices(H)
    crop_x0, crop_x1, _ = sx.indices(W)
    in_h, in_w = crop_y1 - crop_y0, crop_x1 - crop_x0

    # Mosaic DMA slices along the lane (batch) dim must be multiples
    # of the 128-lane tiling -- even whole-axis slices below 128 are
    # rejected (two hardware compile crashes taught this). Batch
    # handling therefore:
    #   B % 128 == 0      one call, 128-lane blocks (the grid's batch
    #                     slices are strided DMAs, not relayouts)
    #   B < 128           the whole batch lane-PADDED to 128 (the pad
    #                     costs one B-sized copy + a constant-cost
    #                     kernel pass; measured +24% over the XLA
    #                     chain at eval B64)
    #   B > 128, B % 128  hybrid: kernel on the 128-aligned prefix,
    #                     the exact XLA phase chain on the remainder
    #                     (lane-padding the remainder costs ~3 GB HBM
    #                     at the B192 eval shape -- measured OOM; the
    #                     two paths are argmax-bit-identical)
    # Interpret mode has no tiling constraints and skips only the pad
    # (tests run small batches where padding would dominate runtime);
    # the hybrid branch runs in both modes so CPU tests cover it.
    main = (B // 128) * 128

    def kernel_call(xs, block_b):
        xt = jnp.transpose(xs, (1, 2, 3, 0))  # bitcast under batch-minor
        idx_t, score_t = _resize_reduce_call(
            xt, crop_y0, crop_x0, in_h, in_w, out_h, out_w, block_b,
            interpret)
        return (jnp.transpose(idx_t, (2, 0, 1)),
                jnp.transpose(score_t, (2, 0, 1)))

    if main == B:
        return kernel_call(x, 128)

    if main == 0:
        if interpret:
            return kernel_call(x, B)
        xs = jnp.pad(x, ((0, 128 - B), (0, 0), (0, 0), (0, 0)))
        idx, score = kernel_call(xs, 128)
        return idx[:B], score[:B]

    from ...models.upsampling import resized_channel_reduce
    from .semantic_reduce import semantic_score_idx
    idx_m, score_m = kernel_call(x[:main], 128)
    cropped = x[main:, crop_slices[0], crop_slices[1], :]
    score_r, idx_r = resized_channel_reduce(
        cropped, out_h, out_w, semantic_score_idx)
    return (jnp.concatenate([idx_m, idx_r], axis=0),
            jnp.concatenate([score_m, score_r], axis=0))


def resize_reduce_supported(x_shape, crop_slices, out_h, out_w,
                            interpret: bool = False) -> bool:
    """Shape/backend gate for `crop_resize_argmax_score`."""
    B, H, W, C = x_shape
    if not interpret and jax.default_backend() != 'tpu':
        return False
    # batch rides the 128 lanes: multiples of 128 run as 128-lane
    # blocks; any other B % 8 == 0 batch additionally runs one
    # lane-padded remainder block (see crop_resize_argmax_score)
    if B % 8:
        return False
    if C % 8:                       # sublane-aligned class axis (DMA)
        return False
    sy, sx = crop_slices
    y0, y1, ys = sy.indices(H)
    x0, x1, xs = sx.indices(W)
    if ys != 1 or xs != 1:
        return False
    in_h, in_w = y1 - y0, x1 - x0
    if in_h < 2 or in_w < 2 or (in_h, in_w) == (out_h, out_w):
        return False
    return _plan_blocks(in_h, in_w, out_h, out_w, C, B, 2,
                        interpret=interpret) is not None
