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

    flat = scores_map.reshape(B, H * W)
    # single top_k, NOT chunked_top_k: inside the fused inference
    # program the chunked variant's (B, C, N/C) reshape relayouts the
    # batch-minor scores map and costs far more than it saves
    # (608 -> 535 frames/s at the bench shape, PERF.md)
    scores, flat_idx = jax.lax.top_k(flat, top_k)

    valid = scores > 0.0
    yx = jnp.stack([flat_idx // W, flat_idx % W], axis=-1).astype(jnp.int32)
    return Centers(yx=yx, score=scores, valid=valid)
