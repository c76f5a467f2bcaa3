"""Decoder bases.

- `DenseDecoderModule` / dense ladder logic: ConvNormAct + N residual
  blocks + 2x upsample per step; side outputs captured *before* each
  upsample during training for multiscale supervision (reference
  model/decoder/dense_base.py:27-284).
- `MLPDecoderBase`: SegFormer-style -- linear-embed main + skip
  branches, upsample all to downsampling 4, concat, 1x1 fuse, dropout
  (reference model/decoder/mlp_base.py:32-172). No side outputs.

Decoders here return RAW outputs `(main, side_outputs)`;
postprocessing is a separate jittable function (see
`postprocessing/`), not an embedded object -- the train/eval fork via
`self.training` becomes an explicit `train` argument.

Subclasses implement `apply_task_head(x, train)` and
`apply_side_head(i, x, train)`; both are invoked inside the compact
`__call__` so they may create submodules."""
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..blocks import make_block
from ..common import ConvNormAct
from ..encoder_decoder_fusion import EncoderDecoderFusion
from ..encoder_decoder_fusion import parse_encoder_decoder_fusion
from ..upsampling import Upsampling


def plan_dense_ladder(
    downsampling_in: int,
    downsamplings: Tuple[int, ...],
    fusion_downsamplings: Tuple[int, ...],
):
    """Plan the decoder ladder (reference dense_base.py:128-200).

    Returns per-module dicts {do_upsampling, side_output, fusion_ds}
    plus the list of side-output downscales."""
    assert sorted(downsamplings, reverse=True) == list(downsamplings)
    assert all(d <= downsampling_in for d in downsamplings)
    assert sorted(fusion_downsamplings, reverse=True) == \
        list(fusion_downsamplings)

    cur = downsampling_in
    modules = []
    side_output_downscales = []
    for ds in downsamplings:
        entry = {}
        if ds < cur:
            entry['side_output'] = True
            side_output_downscales.append(cur)
            entry['do_upsampling'] = True
            cur = ds
        else:
            entry['side_output'] = False
            entry['do_upsampling'] = False
        entry['fusion_ds'] = cur if cur in fusion_downsamplings else -1
        modules.append(entry)
    return modules, tuple(side_output_downscales)


class DenseDecoderModule(nn.Module):
    """One ladder step: [ConvNormAct 3x3] + n blocks + [2x upsample]."""
    n_channels: int
    block: str = 'nonbottleneck1d'
    n_blocks: int = 3
    initial_conv: bool = True
    norm: str = 'batchnorm'
    act: str = 'relu'
    upsampling: Optional[str] = 'bilinear'    # None: no upsampling
    remat: bool = False                  # gradient-checkpoint each block
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.initial_conv:
            x = ConvNormAct(self.n_channels, 3, norm=self.norm,
                            act=self.act, dtype=self.dtype,
                            name='conv')(x, train)
        else:
            assert self.n_blocks > 0

        for i in range(self.n_blocks):
            needs_adapter = x.shape[-1] != self.n_channels
            x = make_block(
                self.block, remat=self.remat, planes=self.n_channels,
                stride=1,
                use_downsample=needs_adapter, norm=self.norm, act=self.act,
                dtype=self.dtype, name=f'block{i}',
            )(x, train)

        out_side = x if train else None

        if self.upsampling is not None:
            x = Upsampling(mode=self.upsampling, n_channels=self.n_channels,
                           dtype=self.dtype, name='upsample')(x)
        return x, out_side


class DenseDecoderBase(nn.Module):
    """Ladder of DenseDecoderModules over decreasing downsamplings with
    encoder-skip fusion after each step."""
    n_channels_in: int = 512
    downsampling_in: int = 32
    n_channels: Tuple[int, ...] = (512, 256, 128)
    downsamplings: Tuple[int, ...] = (16, 8, 4)
    block: str = 'nonbottleneck1d'
    n_blocks: int = 3
    fusion: str = 'add-rgb'
    fusion_n_channels: Tuple[int, ...] = ()
    fusion_downsamplings: Tuple[int, ...] = (16, 8, 4)
    norm: str = 'batchnorm'
    act: str = 'relu'
    upsampling: str = 'bilinear'
    prediction_upsampling: str = 'bilinear'
    remat: bool = False                  # gradient-checkpoint the blocks
    dtype: Any = jnp.float32

    @property
    def side_output_downscales(self) -> Tuple[int, ...]:
        _, downscales = plan_dense_ladder(
            self.downsampling_in, self.downsamplings,
            self.fusion_downsamplings)
        return downscales

    @property
    def side_output_n_channels(self) -> Tuple[int, ...]:
        plan, _ = plan_dense_ladder(
            self.downsampling_in, self.downsamplings,
            self.fusion_downsamplings)
        return tuple(n for n, p in zip(self.n_channels, plan)
                     if p['side_output'])

    # --- to be overridden ---------------------------------------------------
    def apply_task_head(self, x, train: bool):
        raise NotImplementedError

    def apply_side_head(self, i: int, x, train: bool):
        raise NotImplementedError

    # ------------------------------------------------------------------------
    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        """x: (context_features, context_branches); skips:
        {str(ds): {modality: tensor}}. Returns (main, side_outputs)."""
        x, _ = x    # context branches are only for the scene decoder

        plan, _ = plan_dense_ladder(
            self.downsampling_in, self.downsamplings,
            self.fusion_downsamplings)
        assert len(self.fusion_n_channels) == len(self.fusion_downsamplings)
        fusion_cfg = parse_encoder_decoder_fusion(self.fusion)

        side_outputs = []
        fusion_idx = 0
        for i, (n_out, p) in enumerate(zip(self.n_channels, plan)):
            x, side = DenseDecoderModule(
                n_channels=n_out, block=self.block, n_blocks=self.n_blocks,
                norm=self.norm, act=self.act,
                upsampling=self.upsampling if p['do_upsampling'] else None,
                remat=self.remat, dtype=self.dtype, name=f'module{i}',
            )(x, train)
            if p['side_output']:
                side_outputs.append(side)

            if p['fusion_ds'] != -1:
                n_skip = self.fusion_n_channels[fusion_idx]
                x = EncoderDecoderFusion(
                    n_channels_encoder=n_skip, n_channels_decoder=n_out,
                    norm=self.norm, act=self.act, dtype=self.dtype,
                    name=f'fusion{fusion_idx}', **fusion_cfg,
                )(skips[str(p['fusion_ds'])], x, train)
                fusion_idx += 1

        output = self.apply_task_head(x, train)

        if train:
            side_outputs = tuple(
                self.apply_side_head(i, s, train)
                for i, s in enumerate(side_outputs)
            )
        else:
            side_outputs = ()

        return output, side_outputs


class MLPDecoderBase(nn.Module):
    """SegFormer-style MLP decoder: embed + upsample all branches to
    `downsampling_in_heads`, concat, fuse, dropout, head."""
    n_channels_in: int = 512
    downsampling_in: int = 32
    n_channels: Tuple[int, ...] = (128, 128, 128, 128)
    fusion: str = 'select-rgb'
    fusion_n_channels: Tuple[int, ...] = ()
    fusion_downsamplings: Tuple[int, ...] = (16, 8, 4)
    downsampling_in_heads: int = 4
    dropout_p: float = 0.1
    n_channels_out: Optional[int] = None
    norm: str = 'batchnorm'
    act: str = 'relu'
    upsampling: str = 'bilinear'
    prediction_upsampling: str = 'bilinear'
    dtype: Any = jnp.float32

    @property
    def side_output_downscales(self) -> Tuple[int, ...]:
        return ()

    @property
    def head_n_channels(self) -> int:
        if self.n_channels_out is not None:
            return self.n_channels_out
        return sum(self.n_channels) // len(self.n_channels)

    def apply_task_head(self, x, train: bool):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        x, _ = x
        assert len(self.n_channels) == 1 + len(self.fusion_n_channels)
        assert len(self.fusion_n_channels) == len(self.fusion_downsamplings)
        fusion_cfg = parse_encoder_decoder_fusion(self.fusion)

        # main branch
        feat = ConvNormAct(self.n_channels[0], 1, norm=None, act=None,
                           dtype=self.dtype, name='main_embedding')(x, train)
        feat = Upsampling(
            mode=self.upsampling, n_channels=self.n_channels[0],
            scale_factor=self.downsampling_in // self.downsampling_in_heads,
            dtype=self.dtype, name='main_upsample')(feat)
        features = [feat]

        # skip branches ('select' fusion: pick the modality, optional LN)
        for i, (n_skip, n_dec) in enumerate(
            zip(self.fusion_n_channels, self.n_channels[1:])
        ):
            ds = self.fusion_downsamplings[i]
            sel = EncoderDecoderFusion(
                n_channels_encoder=n_skip, n_channels_decoder=n_skip,
                norm=self.norm, act=self.act, dtype=self.dtype,
                name=f'skip_fusion{i}', **fusion_cfg,
            )(skips[str(ds)], None, train)
            sel = ConvNormAct(n_dec, 1, norm=None, act=None,
                              dtype=self.dtype,
                              name=f'skip_embedding{i}')(sel, train)
            sel = Upsampling(
                mode=self.upsampling, n_channels=n_dec,
                scale_factor=ds // self.downsampling_in_heads,
                dtype=self.dtype, name=f'skip_upsample{i}')(sel)
            features.append(sel)

        # fuse(concat(branches)) as per-branch kernel slices summed:
        # the (B, H/4, W/4, sum_C) concat never materializes (common.py
        # _SplitPointwiseConv; parameter tree unchanged)
        x = ConvNormAct(self.head_n_channels, 1, norm=self.norm,
                        act=self.act, dtype=self.dtype,
                        name='fuse')(tuple(features), train)
        x = nn.Dropout(self.dropout_p, broadcast_dims=(1, 2),
                       deterministic=not train)(x)

        output = self.apply_task_head(x, train)
        return output, ()
