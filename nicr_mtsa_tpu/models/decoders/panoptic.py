"""Panoptic helper: wraps the semantic and instance decoders and
returns their raw outputs together, reference
model/decoder/panoptic.py:20-76. The joint panoptic postprocessing
(merge etc.) is the separate jittable function in
postprocessing/panoptic.py."""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .instance import InstanceDecoder
from .semantic import SemanticDecoder


class PanopticHelper(nn.Module):
    semantic_decoder: nn.Module = None
    instance_decoder: nn.Module = None

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        s_output, s_side = self.semantic_decoder(x, skips, train)
        i_output, i_side = self.instance_decoder(x, skips, train)
        return (s_output, i_output), (s_side, i_side)
