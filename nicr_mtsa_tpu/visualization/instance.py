"""Instance-related visualizations (reference
visualization/instance.py:24-351): stable instance colors, center
heatmaps/crosses, offset vector fields, dense orientations, and
per-instance orientation overlays."""
import colorsys
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ._colors import InstanceColorGenerator
from .dense import _to_pil, visualize_heatmap


def _mono_bold_font(size: int = 30):
    """Monospace-bold TTF at the reference's font_size=30 (reference
    bundles FreeMonoBold.ttf); resolved from matplotlib's bundled
    DejaVu fonts, with the PIL bitmap font as last resort."""
    from PIL import ImageFont
    try:
        import os
        import matplotlib
        path = os.path.join(os.path.dirname(matplotlib.__file__),
                            'mpl-data', 'fonts', 'ttf',
                            'DejaVuSansMono-Bold.ttf')
        return ImageFont.truetype(path, size)
    except Exception:
        try:
            return ImageFont.truetype('FreeMonoBold.ttf', size)
        except Exception:
            return ImageFont.load_default()


def visualize_instance(instance_img: np.ndarray,
                       color_generator: Optional[InstanceColorGenerator]
                       = None) -> np.ndarray:
    """(H, W) instance ids -> (H, W, 3) uint8 with stable colors."""
    instance_img = np.asarray(instance_img).astype(np.int64)
    gen = color_generator or InstanceColorGenerator()
    palette = gen.palette(int(instance_img.max()) if instance_img.size
                          else 0)
    return palette[np.clip(instance_img, 0, len(palette) - 1)]


def visualize_instance_pil(instance_img, color_generator=None):
    return _to_pil(visualize_instance(instance_img, color_generator))


def visualize_instance_center(
    center_img: Optional[np.ndarray] = None,
    centers: Optional[Sequence[Tuple[int, int]]] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    min_: float = 0.0,
    max_: float = 1.0,
    cross_size: int = 3,
) -> np.ndarray:
    """Either colormap a center heatmap, or draw crosses at given
    (y, x) center coordinates."""
    if center_img is not None:
        return visualize_heatmap(center_img, min_=min_, max_=max_)

    assert centers is not None and height and width
    img = np.zeros((height, width, 3), np.uint8)
    for (y, x) in centers:
        y, x = int(y), int(x)
        y0, y1 = max(0, y - cross_size), min(height, y + cross_size + 1)
        x0, x1 = max(0, x - cross_size), min(width, x + cross_size + 1)
        img[y0:y1, x] = (255, 0, 0)
        img[y, x0:x1] = (255, 0, 0)
    return img


def visualize_instance_center_pil(center_img=None, centers=None,
                                  height=None, width=None,
                                  min_=0.0, max_=1.0):
    return _to_pil(visualize_instance_center(
        center_img, centers, height, width, min_, max_))


def _angle_magnitude_to_rgb(angle, magnitude):
    """HSV wheel: hue = angle, value = normalized magnitude."""
    h = (angle + np.pi) / (2 * np.pi)
    s = np.ones_like(h)
    v = magnitude
    hsv = np.stack([h, s, v], axis=-1)
    # vectorized hsv -> rgb
    i = np.floor(hsv[..., 0] * 6.0).astype(int) % 6
    f = hsv[..., 0] * 6.0 - np.floor(hsv[..., 0] * 6.0)
    p = hsv[..., 2] * (1 - hsv[..., 1])
    q = hsv[..., 2] * (1 - f * hsv[..., 1])
    t = hsv[..., 2] * (1 - (1 - f) * hsv[..., 1])
    vv = hsv[..., 2]
    r = np.choose(i, [vv, q, p, p, t, vv])
    g = np.choose(i, [t, vv, vv, q, p, p])
    b = np.choose(i, [p, p, t, vv, vv, q])
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def visualize_instance_offset(offset_img: np.ndarray) -> np.ndarray:
    """(H, W, 2) (dy, dx) offsets -> direction-as-hue image."""
    off = np.asarray(offset_img, np.float32)
    angle = np.arctan2(off[..., 0], off[..., 1])
    mag = np.linalg.norm(off, axis=-1)
    mag = mag / max(float(mag.max()), 1e-6)
    return _angle_magnitude_to_rgb(angle, mag)


def visualize_instance_offset_pil(offset_img):
    return _to_pil(visualize_instance_offset(offset_img))


def visualize_orientation(orientation_img: np.ndarray) -> np.ndarray:
    """(H, W, 2) biternion (cos, sin) -> angle-as-hue image; pixels
    with near-zero vectors stay black."""
    o = np.asarray(orientation_img, np.float32)
    angle = np.arctan2(o[..., 1], o[..., 0])
    mag = np.clip(np.linalg.norm(o, axis=-1), 0.0, 1.0)
    return _angle_magnitude_to_rgb(angle, mag)


def visualize_orientation_pil(orientation_img):
    return _to_pil(visualize_orientation(orientation_img))


def visualize_instance_orientations(
    instance_img: np.ndarray,
    orientations: Dict[int, float],
    color_generator: Optional[InstanceColorGenerator] = None,
    arrow_length: int = 12,
) -> np.ndarray:
    """Instance image with an orientation arrow and angle text at each
    oriented instance's centroid. The reference bundles FreeMonoBold.ttf
    at font_size=30 (reference visualization/instance.py:236-242); here
    a monospace-bold TTF is resolved from matplotlib's bundled fonts at
    the same size, falling back to the PIL bitmap font without it."""
    img = visualize_instance(instance_img, color_generator)
    instance_img = np.asarray(instance_img)

    from PIL import Image, ImageDraw
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    font = _mono_bold_font(size=30)
    for instance_id, angle in orientations.items():
        mask = instance_img == instance_id
        if not mask.any():
            continue
        ys, xs = np.nonzero(mask)
        cy, cx = float(ys.mean()), float(xs.mean())
        dy = -np.cos(float(angle)) * arrow_length
        dx = np.sin(float(angle)) * arrow_length
        draw.line([(cx, cy), (cx + dx, cy + dy)], fill=(255, 255, 255),
                  width=2)
        draw.text((cx + 2, cy + 2),
                  f'{np.rad2deg(float(angle)):.0f}',
                  fill=(255, 255, 255), font=font)
    return np.asarray(pil)


def visualize_instance_orientations_pil(instance_img, orientations,
                                        color_generator=None):
    return _to_pil(visualize_instance_orientations(
        instance_img, orientations, color_generator))
