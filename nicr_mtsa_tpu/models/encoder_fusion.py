"""RGB-D encoder fusion: channel-weighted add of rgb+depth features.

Reference model/encoder_fusion.py:17-119. Variants ('se-add', 'add',
'*-uni-rgb', '*-uni-depth', 'none') choose SE weighting and which
branches receive the fused features. The reference's NHWC permute
wrapper is unnecessary: everything is NHWC here."""
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .common import SqueezeAndExcitation


KNOWN_ENCODER_FUSIONS = (
    'se-add', 'add',                        # bidirectional
    'add-uni-rgb', 'add-uni-depth',         # unidirectional
    'se-add-uni-rgb', 'se-add-uni-depth',   # unidirectional with SE
    'none',
)


class EncoderRGBDFusionWeightedAdd(nn.Module):
    n_channels_in: int
    destinations: Tuple[str, ...] = ('rgb',)
    use_se_weighting: bool = False
    act: str = 'relu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x_rgb, x_depth = x['rgb'], x['depth']

        if self.use_se_weighting:
            rgb_weighted = SqueezeAndExcitation(
                self.n_channels_in, act=self.act, dtype=self.dtype,
                name='weighting_rgb')(x_rgb)
            depth_weighted = SqueezeAndExcitation(
                self.n_channels_in, act=self.act, dtype=self.dtype,
                name='weighting_depth')(x_depth)
        else:
            rgb_weighted, depth_weighted = x_rgb, x_depth

        fused = rgb_weighted + depth_weighted

        y_rgb = fused if 'rgb' in self.destinations else x_rgb
        y_depth = fused if 'depth' in self.destinations else x_depth
        return {'rgb': y_rgb, 'depth': y_depth}


def get_encoder_fusion_kwargs(name: Optional[str] = None) -> dict:
    """Resolve a fusion registry name to constructor kwargs."""
    if name is None:
        name = 'add-uni-rgb'
    name = name.lower()
    if name not in KNOWN_ENCODER_FUSIONS:
        raise ValueError(f"Unknown encoder fusion: '{name}'")

    kwargs = {'use_se_weighting': 'se' in name}
    if 'uni-rgb' in name:
        kwargs['destinations'] = ('rgb',)
    elif 'uni-depth' in name:
        kwargs['destinations'] = ('depth',)
    elif 'none' == name:
        kwargs['destinations'] = ()
    else:
        kwargs['destinations'] = ('rgb', 'depth')
    return kwargs
