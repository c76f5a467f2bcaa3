"""Multi-task model composition: encoder -> context module -> one
decoder per enabled task.

The reference leaves this composition to the downstream EMSANet repo
(its pieces are wired in tests/test_decoders+postprocessing.py:91-141);
here it is a first-class flax module plus an EMSANet-style factory so
a single config yields the complete network. Raw per-task outputs
`(main, side_outputs)` feed the standalone postprocessors
(postprocessing/) and task helpers (tasks/)."""
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .backbones import get_backbone
from .context import get_context_module
from .decoders import (
    EmbeddingDecoder, EmbeddingMLPDecoder,
    InstanceDecoder, InstanceMLPDecoder,
    NormalDecoder, NormalMLPDecoder,
    SceneClassificationDecoder,
    SemanticDecoder, SemanticMLPDecoder,
)
from .encoder import get_encoder


@dataclass
class MultiTaskModelConfig:
    """EMSANet-style configuration (defaults follow the EMSANet NYUv2
    reference setup: 2x ResNet-34 NBt1D, se-add fusion, PPM context,
    dense decoders with NBt1D blocks at (512, 256, 128) channels)."""
    tasks: Tuple[str, ...] = ('semantic', 'instance', 'orientation',
                              'scene')
    # encoder
    backbone_rgb: Optional[str] = 'resnet34'
    backbone_depth: Optional[str] = 'resnet34'
    backbone_rgbd: Optional[str] = None
    resnet_block: str = 'nonbottleneck1d'
    encoder_fusion: str = 'se-add-uni-rgb'
    normalization: str = 'batchnorm'
    activation: str = 'relu'
    skip_downsamplings: Tuple[int, ...] = (4, 8, 16)
    # context
    context_module: str = 'ppm'
    context_n_channels: int = 512
    input_size: Tuple[int, int] = (480, 640)
    # decoders
    decoder_type: str = 'dense'             # 'dense' | 'mlp'
    decoder_n_channels: Tuple[int, ...] = (512, 256, 128)
    decoder_downsamplings: Tuple[int, ...] = (16, 8, 4)
    decoder_block: str = 'nonbottleneck1d'
    decoder_n_blocks: int = 3
    encoder_decoder_fusion: str = 'add-rgb'
    upsampling: str = 'learned-3x3-zeropad'
    prediction_upsampling: str = 'learned-3x3-zeropad'
    # tasks
    semantic_n_classes: int = 40            # without void
    scene_n_classes: int = 10               # without void
    embedding_dim: int = 512
    instance_center_sigma: int = 8          # informational
    # serving: return the semantic head's final prediction upsampling
    # as DeferredUpsampling so postprocessing fuses it with the
    # argmax/score reduction (ops/pallas/semantic_finisher.py); the
    # parameter tree is unchanged, so checkpoints interchange with the
    # non-deferred model. 'all' defers BOTH prediction upsamplings as
    # DeferredUpsampling2 for the fused 4x finisher
    # (ops/pallas/semantic_finisher4x.py); requires downsampling-4
    # heads (two-step ladder)
    defer_semantic_prediction_upsampling: object = False  # False|True|'all'
    # gradient checkpointing (residual/Swin blocks recompute in the
    # backward pass; parameter trees unchanged, checkpoints
    # interchange): backbone_remat covers encoder blocks of BOTH
    # families (Swin blocks, ResNet/NBt1D residual blocks),
    # decoder_remat the dense decoders' residual blocks -- together
    # they lift the EMSANet train activation ceiling (B96 OOMed by
    # 4.8 G without a CNN remat path, PERF.md batch boundaries)
    backbone_remat: bool = False
    decoder_remat: bool = False
    # images per window-attention chunk in Swin blocks (0 = whole
    # batch); bounds live attention intermediates for big serve batches
    backbone_attn_chunk_size: int = 0
    # window-attention backend for Swin blocks ('auto' = fused Pallas
    # kernel on TPU when shapes allow, 'xla', 'pallas-interpret')
    backbone_attn_backend: str = 'auto'
    # compute
    dtype: Any = jnp.float32


class MultiTaskModel(nn.Module):
    """Composed multi-task network; returns {task: (main, side)}."""
    encoder: nn.Module = None
    context_module: nn.Module = None
    semantic_decoder: Optional[nn.Module] = None
    instance_decoder: Optional[nn.Module] = None
    normal_decoder: Optional[nn.Module] = None
    scene_decoder: Optional[nn.Module] = None
    embedding_decoder: Optional[nn.Module] = None
    context_input_modality: str = 'rgb'

    @nn.compact
    def __call__(self, inputs: Dict[str, Any], train: bool = False):
        enc_out, skips = self.encoder(inputs, train)

        # context module consumes the (fused) primary modality
        modality = (self.context_input_modality
                    if self.context_input_modality in enc_out
                    else list(enc_out.keys())[0])
        x = self.context_module(enc_out[modality], train)

        outputs = {}
        if self.semantic_decoder is not None:
            outputs['semantic'] = self.semantic_decoder(x, skips, train)
        if self.instance_decoder is not None:
            outputs['instance'] = self.instance_decoder(x, skips, train)
        if self.normal_decoder is not None:
            outputs['normal'] = self.normal_decoder(x, skips, train)
        if self.scene_decoder is not None:
            outputs['scene'] = self.scene_decoder(x, skips, train)
        if self.embedding_decoder is not None:
            outputs['dense_visual_embedding'] = \
                self.embedding_decoder(x, skips, train)
        return outputs


def build_model(config: MultiTaskModelConfig) -> MultiTaskModel:
    c = config

    backbone_rgb = backbone_depth = backbone_rgbd = None
    def _bb_kwargs(name):
        kw = {}
        if c.backbone_remat:
            kw['remat'] = True
        if not name.startswith('swin'):
            return kw
        if c.backbone_attn_chunk_size:
            kw['attn_chunk_size'] = c.backbone_attn_chunk_size
        if c.backbone_attn_backend != 'auto':
            kw['attn_backend'] = c.backbone_attn_backend
        return kw

    if c.backbone_rgbd is not None:
        backbone_rgbd = get_backbone(
            c.backbone_rgbd, resnet_block=c.resnet_block,
            n_input_channels=4, normalization=c.normalization,
            activation=c.activation, dtype=c.dtype,
            **_bb_kwargs(c.backbone_rgbd))
    else:
        if c.backbone_rgb is not None:
            backbone_rgb = get_backbone(
                c.backbone_rgb, resnet_block=c.resnet_block,
                n_input_channels=3, normalization=c.normalization,
                activation=c.activation, dtype=c.dtype,
                **_bb_kwargs(c.backbone_rgb))
        if c.backbone_depth is not None:
            backbone_depth = get_backbone(
                c.backbone_depth, resnet_block=c.resnet_block,
                n_input_channels=1, normalization=c.normalization,
                activation=c.activation, dtype=c.dtype,
                **_bb_kwargs(c.backbone_depth))

    encoder = get_encoder(
        backbone_rgb=backbone_rgb, backbone_depth=backbone_depth,
        backbone_rgbd=backbone_rgbd, fusion=c.encoder_fusion,
        activation=c.activation, skip_downsamplings=c.skip_downsamplings,
        dtype=c.dtype)

    downsampling_in = encoder.downsampling
    cm_input_size = (c.input_size[0] // downsampling_in,
                     c.input_size[1] // downsampling_in)
    context = get_context_module(
        c.context_module, encoder.n_channels_out, c.context_n_channels,
        input_size=cm_input_size, normalization=c.normalization,
        activation=c.activation, dtype=c.dtype)

    # decoders consume skips in DESCENDING downsampling order
    ds_to_channels = dict(zip(encoder.skips_downsamplings,
                              encoder.skips_n_channels))
    fusion_downsamplings = tuple(sorted(encoder.skips_downsamplings,
                                        reverse=True))
    fusion_n_channels = tuple(ds_to_channels[ds]
                              for ds in fusion_downsamplings)

    is_mlp = c.decoder_type == 'mlp'

    # single-backbone encoders produce a single (lazily-resolved) skip
    # modality; strip an explicit -rgb/-depth suffix in that case
    ed_fusion = c.encoder_decoder_fusion
    if backbone_rgb is None or backbone_depth is None:
        ed_fusion = ed_fusion.replace('-rgb', '').replace('-depth', '')

    common = dict(
        n_channels_in=c.context_n_channels,
        downsampling_in=downsampling_in,
        fusion=ed_fusion,
        fusion_n_channels=fusion_n_channels,
        fusion_downsamplings=fusion_downsamplings,
        norm=c.normalization, act=c.activation,
        upsampling=c.upsampling,
        prediction_upsampling=c.prediction_upsampling,
        dtype=c.dtype,
    )
    if is_mlp:
        common['n_channels'] = (c.decoder_n_channels[0],) + tuple(
            c.decoder_n_channels[:len(fusion_n_channels)])
    else:
        common.update(
            n_channels=c.decoder_n_channels,
            downsamplings=c.decoder_downsamplings,
            block=c.decoder_block,
            n_blocks=c.decoder_n_blocks,
            remat=c.decoder_remat,
        )

    tasks = set(c.tasks)
    semantic_decoder = instance_decoder = None
    normal_decoder = scene_decoder = embedding_decoder = None

    if 'semantic' in tasks or 'panoptic' in tasks:
        cls = SemanticMLPDecoder if is_mlp else SemanticDecoder
        semantic_decoder = cls(
            n_classes=c.semantic_n_classes,
            defer_prediction_upsampling=(
                c.defer_semantic_prediction_upsampling),
            name='semantic_decoder', **common)
    if 'instance' in tasks or 'panoptic' in tasks:
        cls = InstanceMLPDecoder if is_mlp else InstanceDecoder
        instance_decoder = cls(
            with_orientation='orientation' in tasks,
            name='instance_decoder', **common)
    if 'normal' in tasks:
        cls = NormalMLPDecoder if is_mlp else NormalDecoder
        normal_decoder = cls(name='normal_decoder', **common)
    if 'scene' in tasks:
        scene_decoder = SceneClassificationDecoder(
            n_channels_in=c.context_n_channels,
            n_classes=c.scene_n_classes,
            dtype=c.dtype, name='scene_decoder')
    if 'dense_visual_embedding' in tasks:
        cls = EmbeddingMLPDecoder if is_mlp else EmbeddingDecoder
        embedding_decoder = cls(embedding_dim=c.embedding_dim,
                                name='embedding_decoder', **common)

    return MultiTaskModel(
        encoder=encoder,
        context_module=context,
        semantic_decoder=semantic_decoder,
        instance_decoder=instance_decoder,
        normal_decoder=normal_decoder,
        scene_decoder=scene_decoder,
        embedding_decoder=embedding_decoder,
    )
