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
    scores, flat_idx = jax.lax.top_k(flat, top_k)

    valid = scores > 0.0
    yx = jnp.stack([flat_idx // W, flat_idx % W], axis=-1).astype(jnp.int32)
    return Centers(yx=yx, score=scores, valid=valid)
