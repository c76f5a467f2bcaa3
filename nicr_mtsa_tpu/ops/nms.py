"""Keypoint (instance-center) NMS -- jittable, fixed-K.

Replaces the reference's max_pool2d(return_indices) pipeline
(model/postprocessing/instance.py:79-168) with static shifted
comparisons: a pixel survives iff it is the FIRST maximum (row-major
scan order) of the k x k window centered on it -- exactly the
semantics of the pooling-index trick the reference uses to
disambiguate ties under quantization. Pixels closer than (k-1)/2 to
the border are excluded, matching the reference's zero-padding of the
pooled map.

The variable-length center lists of the reference become fixed-K
padded arrays (centers_yx, scores, valid) via `lax.top_k`
(ties broken by lowest flat index, the scan order).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Centers(NamedTuple):
    yx: jnp.ndarray        # (B, K, 2) int32 center coordinates
    score: jnp.ndarray     # (B, K) float heatmap value (-1 for padding)
    valid: jnp.ndarray     # (B, K) bool


def nms_keep_mask(
    heatmap: jnp.ndarray,
    threshold: float = 0.1,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W) bool: local maxima above threshold.

    First-max-in-window-wins tie breaking; border pixels excluded."""
    assert kernel_size % 2 == 1
    pad = (kernel_size - 1) // 2

    hm = jnp.where(heatmap > threshold, heatmap, -1.0)

    padded = jnp.pad(hm, ((0, 0), (pad, pad), (pad, pad)),
                     constant_values=-jnp.inf)

    H, W = hm.shape[-2:]
    keep = hm > -1.0    # survivors must exceed the threshold placeholder
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            neighbor = jax.lax.dynamic_slice(
                padded,
                (0, dy + pad, dx + pad),
                hm.shape,
            )
            later_in_scan = (dy > 0) or (dy == 0 and dx > 0)
            if later_in_scan:
                keep &= hm >= neighbor       # tie -> current pixel wins
            else:
                keep &= hm > neighbor        # tie -> earlier pixel wins

    # exclude border pixels entirely (resizing artifacts; reference
    # pads the pooled map with zeros which voids the border)
    border = jnp.zeros((H, W), dtype=bool)
    border = border.at[pad:H - pad, pad:W - pad].set(True)
    return keep & border


def chunked_top_k(flat: jnp.ndarray, k: int):
    """Exact top-k over the last axis via hierarchical selection
    (per-chunk top-k, then a merge over the C*k survivors).

    Exactness incl. tie order: the global top-k is a subset of the
    union of per-chunk top-k's, and positions in the merged array are
    monotone in the original flat index (chunk-major, rank ties broken
    by index inside lax.top_k), so the merge's lowest-index tie-break
    matches the single-call semantics.

    NOT used in get_instance_centers: inside the fused inference
    program the chunking reshape relayouts the batch-minor input and
    loses more than the smaller sorts save (measured 608 -> 535
    frames/s, PERF.md). Useful standalone on row-major inputs."""
    B, N = flat.shape
    n_chunks = next((c for c in (16, 8, 4, 2)
                     if N % c == 0 and N // c >= k), 1)
    if n_chunks == 1:
        return jax.lax.top_k(flat, k)

    chunk = N // n_chunks
    s1, i1 = jax.lax.top_k(flat.reshape(B, n_chunks, chunk), k)
    i1 = i1 + (jnp.arange(n_chunks, dtype=i1.dtype) * chunk)[None, :, None]
    s1 = s1.reshape(B, n_chunks * k)
    i1 = i1.reshape(B, n_chunks * k)
    scores, sel = jax.lax.top_k(s1, k)
    return scores, jnp.take_along_axis(i1, sel, axis=1)


def _block_reduced_top_k(scores_map: jnp.ndarray, top_k: int):
    """Exact top-k over an NMS-masked scores map via a 2x2 block
    reduction (4x smaller `lax.top_k` input).

    Validity: with kernel_size >= 3, any two pixels of a 2x2 block are
    mutual window neighbors, and the keep-mask's asymmetric tie rule
    (earlier-in-scan wins) kills at least one of any surviving pair --
    so each 2x2 block holds AT MOST ONE survivor, and every
    non-survivor is exactly the -1.0 placeholder. The block-max array
    therefore contains every survivor score exactly once, and top-k
    over it equals top-k over the full map as a SET.

    Tie order: `lax.top_k` breaks score ties by lowest flat index. The
    reduced top-k breaks them by lowest BLOCK index, which can disagree
    with pixel order across block rows, so we pull 4*top_k candidates
    and re-sort them by (-score, original flat index) with a stable
    two-key sort. This reproduces the full-map order exactly unless a
    single tie group at the k-th score exceeds 3*top_k candidates
    (degenerate heatmaps; the selected set is score-identical then).
    """
    B, H, W = scores_map.shape
    a = scores_map[:, 0::2, 0::2]
    b = scores_map[:, 0::2, 1::2]
    c = scores_map[:, 1::2, 0::2]
    d = scores_map[:, 1::2, 1::2]
    m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    # original flat index of the first in-block maximum; block scan
    # order (a, b, c, d) is ascending flat-index order within the block
    Hr, Wr = H // 2, W // 2
    base = (jax.lax.broadcasted_iota(jnp.int32, (B, Hr, Wr), 1) * (2 * W)
            + jax.lax.broadcasted_iota(jnp.int32, (B, Hr, Wr), 2) * 2)
    idx = jnp.where(a == m, base,
          jnp.where(b == m, base + 1,
          jnp.where(c == m, base + W, base + W + 1)))

    k2 = min(2 * top_k, Hr * Wr)
    s2, pos = jax.lax.top_k(m.reshape(B, Hr * Wr), k2)
    i2 = jnp.take_along_axis(idx.reshape(B, Hr * Wr), pos, axis=1)
    _, i_sorted, s_sorted = jax.lax.sort(
        (-s2.astype(jnp.float32), i2, s2), num_keys=2, is_stable=True)
    return s_sorted[:, :top_k], i_sorted[:, :top_k]


@partial(jax.jit, static_argnames=('threshold', 'kernel_size',
                                   'top_k', 'use_foreground_mask'))
def get_instance_centers(
    heatmap: jnp.ndarray,
    foreground_mask: jnp.ndarray = None,
    threshold: float = 0.1,
    kernel_size: int = 3,
    top_k: int = 64,
    use_foreground_mask: bool = False,
) -> Centers:
    """(B, H, W[, 1]) heatmap -> top-K padded center table.

    NOTE: requires threshold > 0 (the reference's clamp of the k-th
    score to >= 0 relies on it, instance.py:145-155)."""
    if heatmap.ndim == 4:
        heatmap = heatmap[..., 0]
    B, H, W = heatmap.shape

    keep = nms_keep_mask(heatmap, threshold, kernel_size)
    scores_map = jnp.where(keep, heatmap, -1.0)

    if use_foreground_mask and foreground_mask is not None:
        fg = foreground_mask
        if fg.ndim == 4:
            fg = fg[..., 0]
        scores_map = jnp.where(fg, scores_map, -1.0)

    if kernel_size >= 3 and H % 2 == 0 and W % 2 == 0 \
            and H * W > 4 * top_k:
        # 2x2 block reduction: exact (see _block_reduced_top_k) and
        # shrinks the top_k operand 4x. NOT chunked_top_k: that
        # variant's (B, C, N/C) reshape relayouts the batch-minor
        # scores map and costs more than it saves (608 -> 535 f/s at
        # the bench shape, PERF.md); the strided block slices fuse
        # into the keep-mask computation instead
        scores, flat_idx = _block_reduced_top_k(scores_map, top_k)
    else:
        # kernel_size 1 performs no suppression (multiple survivors
        # per block possible), odd shapes don't tile: plain top_k
        scores, flat_idx = jax.lax.top_k(
            scores_map.reshape(B, H * W), top_k)

    valid = scores > 0.0
    yx = jnp.stack([flat_idx // W, flat_idx % W], axis=-1).astype(jnp.int32)
    return Centers(yx=yx, score=scores, valid=valid)
