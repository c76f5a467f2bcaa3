"""Encoders: single-backbone (rgb, depth, or concat rgbd) and fused
dual-backbone RGB-D.

Reference model/encoder.py:22-302. The encoder contract:
`__call__({modality: x}, train) -> ({modality: out}, skips)` with
`skips = {str(downsampling): {modality: features}}` (string keys kept
for reference parity). Skip capture honors the reference's
"last stage with that downsampling, unless it's the final stage"
rule (encoder.py:84-95) so `-d16` backbones behave identically.

The fused encoder interleaves per-stage fusion: the fused features
feed the NEXT stage of the destination backbone(s)
(encoder.py:233-246)."""
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .backbones.base import Backbone
from .encoder_fusion import EncoderRGBDFusionWeightedAdd
from .encoder_fusion import get_encoder_fusion_kwargs


def _skip_stage_indices(
    stages_downsampling: Sequence[int],
    skip_downsamplings: Sequence[int],
) -> List[int]:
    """stage index to capture for each skip downsampling."""
    n_stages = len(stages_downsampling)
    indices = []
    for ds in skip_downsamplings:
        last_idx = list(stages_downsampling)[::-1].index(ds)
        stage_idx = n_stages - 1 - last_idx
        if stage_idx == n_stages - 1:
            # final stage hit (e.g. reduced downsampling): first occurrence
            stage_idx = list(stages_downsampling).index(ds)
        indices.append(stage_idx)
    return indices


class EncoderBase(nn.Module):
    @property
    def skips_n_channels(self) -> Tuple[int, ...]:
        raise NotImplementedError

    @property
    def skips_downsamplings(self) -> Sequence[int]:
        raise NotImplementedError

    @property
    def n_channels_out(self) -> int:
        raise NotImplementedError

    @property
    def downsampling(self) -> int:
        raise NotImplementedError


class Encoder(EncoderBase):
    """Single-backbone encoder (one modality, or rgbd concat)."""
    backbone: Backbone = None
    skip_downsamplings: Sequence[int] = (4, 8, 16)

    @property
    def skips_n_channels(self) -> Tuple[int, ...]:
        idx = _skip_stage_indices(self.backbone.stages_downsampling,
                                  self.skip_downsamplings)
        return tuple(self.backbone.stages_n_channels[i] for i in idx)

    @property
    def skips_downsamplings(self) -> Sequence[int]:
        return self.skip_downsamplings

    @property
    def n_channels_out(self) -> int:
        return self.backbone.stages_n_channels[-1]

    @property
    def downsampling(self) -> int:
        return self.backbone.stages_downsampling[-1]

    @nn.compact
    def __call__(self, x: Dict[str, Any], train: bool = False):
        assert len(x) == 1
        key = list(x.keys())[0]

        outs = self.backbone(x[key], train)

        skip_idx = _skip_stage_indices(self.backbone.stages_downsampling,
                                       self.skip_downsamplings)
        skips = {
            str(ds): {key: outs[i]}
            for ds, i in zip(self.skip_downsamplings, skip_idx)
        }
        return {key: outs[-1]}, skips


class FusedRGBDEncoder(EncoderBase):
    """Dual-backbone RGB-D encoder with per-stage fusion; skips store
    both modalities (reference encoder.py:146-260)."""
    backbone_rgb: Backbone = None
    backbone_depth: Backbone = None
    fusion: str = 'se-add-uni-rgb'
    act: str = 'relu'
    skip_downsamplings: Sequence[int] = (4, 8, 16)
    dtype: Any = jnp.float32

    def _check(self):
        b_rgb, b_depth = self.backbone_rgb, self.backbone_depth
        assert b_rgb.n_stages == b_depth.n_stages
        assert b_rgb.stages_n_channels == b_depth.stages_n_channels
        assert b_rgb.stages_downsampling == b_depth.stages_downsampling

    @property
    def skips_n_channels(self) -> Tuple[int, ...]:
        idx = _skip_stage_indices(self.backbone_rgb.stages_downsampling,
                                  self.skip_downsamplings)
        return tuple(self.backbone_rgb.stages_n_channels[i] for i in idx)

    @property
    def skips_downsamplings(self) -> Sequence[int]:
        return self.skip_downsamplings

    @property
    def n_channels_out(self) -> int:
        return self.backbone_rgb.stages_n_channels[-1]

    @property
    def downsampling(self) -> int:
        return self.backbone_rgb.stages_downsampling[-1]

    @nn.compact
    def __call__(self, x: Dict[str, Any], train: bool = False):
        assert len(x) == 2
        self._check()

        fusion_kwargs = get_encoder_fusion_kwargs(self.fusion)
        stages_n_channels = self.backbone_rgb.stages_n_channels
        skip_idx = _skip_stage_indices(
            self.backbone_rgb.stages_downsampling, self.skip_downsamplings)
        idx_to_ds = {i: ds
                     for ds, i in zip(self.skip_downsamplings, skip_idx)}

        skips = {}
        x_ = {'rgb': x['rgb'], 'depth': x['depth']}
        for i in range(self.backbone_rgb.n_stages):
            # stage-interleaved: fused features feed the next stage
            x_ = {
                'rgb': self.backbone_rgb.forward_stage(i, x_['rgb'], train),
                'depth': self.backbone_depth.forward_stage(
                    i, x_['depth'], train),
            }
            x_ = EncoderRGBDFusionWeightedAdd(
                n_channels_in=stages_n_channels[i],
                act=self.act, dtype=self.dtype,
                name=f'fusion{i}', **fusion_kwargs,
            )(x_)
            if i in idx_to_ds:
                skips[str(idx_to_ds[i])] = dict(x_)
        return x_, skips


def get_encoder(
    backbone_rgb: Backbone = None,
    backbone_depth: Backbone = None,
    backbone_rgbd: Backbone = None,
    fusion: str = None,
    activation: str = 'relu',
    skip_downsamplings: Sequence[int] = (4, 8, 16),
    dtype: Any = jnp.float32,
) -> EncoderBase:
    """Factory (reference encoder.py:267-302): fused rgb+depth, rgbd
    single backbone, or single modality."""
    if backbone_rgb is not None and backbone_depth is not None:
        return FusedRGBDEncoder(
            backbone_rgb=backbone_rgb,
            backbone_depth=backbone_depth,
            fusion=fusion if fusion is not None else 'add-uni-rgb',
            act=activation,
            skip_downsamplings=skip_downsamplings,
            dtype=dtype,
        )
    if backbone_rgbd is not None:
        backbone = backbone_rgbd
    elif (backbone_rgb is not None) ^ (backbone_depth is not None):
        backbone = backbone_rgb if backbone_rgb is not None else backbone_depth
    else:
        raise ValueError('Either `backbone_rgb` and/or `backbone_depth` or '
                         '`backbone_rgbd` must be given.')
    return Encoder(backbone=backbone, skip_downsamplings=skip_downsamplings)
