"""Canonical model presets.

These mirror the driver's benchmark configurations (BASELINE.json
"configs") and the published EMSANet / EMSAFormer setups built from
the reference library."""
from typing import Tuple

import jax.numpy as jnp

from .models.multi_task import MultiTaskModelConfig


def resnet18_rgb_semantic(n_classes: int = 40,
                          input_size: Tuple[int, int] = (480, 640),
                          dtype=jnp.float32) -> MultiTaskModelConfig:
    """Config #1: ResNet-18 RGB-only semantic segmentation."""
    return MultiTaskModelConfig(
        tasks=('semantic',),
        backbone_rgb='resnet18', backbone_depth=None,
        resnet_block='basicblock',
        context_module='ppm', context_n_channels=512,
        decoder_n_channels=(512, 256, 128), decoder_n_blocks=3,
        input_size=input_size, semantic_n_classes=n_classes,
        dtype=dtype,
    )


def rgbd_resnet34_nbt1d_semantic(
        n_classes: int = 37,
        input_size: Tuple[int, int] = (480, 640),
        dtype=jnp.bfloat16) -> MultiTaskModelConfig:
    """Config #2: RGB-D 2x ResNet-34 NBt1D encoder fusion + semantic
    decoder (SUNRGB-D, ESANet-style)."""
    return MultiTaskModelConfig(
        tasks=('semantic',),
        backbone_rgb='resnet34', backbone_depth='resnet34',
        resnet_block='nonbottleneck1d',
        encoder_fusion='se-add-uni-rgb',
        context_module='ppm', context_n_channels=512,
        decoder_n_channels=(512, 256, 128), decoder_n_blocks=3,
        input_size=input_size, semantic_n_classes=n_classes,
        dtype=dtype,
    )


def panoptic_resnet34_nbt1d(
        n_classes: int = 40,
        input_size: Tuple[int, int] = (480, 640),
        dtype=jnp.bfloat16) -> MultiTaskModelConfig:
    """Config #3: panoptic -- semantic + instance center/offset heads
    (NYUv2)."""
    return MultiTaskModelConfig(
        tasks=('semantic', 'instance'),
        backbone_rgb='resnet34', backbone_depth='resnet34',
        resnet_block='nonbottleneck1d',
        encoder_fusion='se-add-uni-rgb',
        context_module='ppm', context_n_channels=512,
        decoder_n_channels=(512, 256, 128), decoder_n_blocks=3,
        upsampling='learned-3x3-zeropad',
        prediction_upsampling='learned-3x3-zeropad',
        input_size=input_size, semantic_n_classes=n_classes,
        dtype=dtype,
    )


def emsanet(n_classes: int = 40, scene_n_classes: int = 10,
            input_size: Tuple[int, int] = (480, 640),
            dtype=jnp.bfloat16) -> MultiTaskModelConfig:
    """Config #4: full EMSANet multi-task -- panoptic + instance
    orientation + scene classification (the bench.py flagship)."""
    return MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet34', backbone_depth='resnet34',
        resnet_block='nonbottleneck1d',
        encoder_fusion='se-add-uni-rgb',
        context_module='ppm', context_n_channels=512,
        decoder_n_channels=(512, 256, 128), decoder_n_blocks=3,
        upsampling='learned-3x3-zeropad',
        prediction_upsampling='learned-3x3-zeropad',
        input_size=input_size,
        semantic_n_classes=n_classes, scene_n_classes=scene_n_classes,
        dtype=dtype,
    )


def emsaformer_dve(n_classes: int = 40, scene_n_classes: int = 10,
                   embedding_dim: int = 512,
                   input_size: Tuple[int, int] = (480, 640),
                   dtype=jnp.bfloat16) -> MultiTaskModelConfig:
    """Config #5: EMSAFormer -- multimodal Swin-T-128 RGB-D + MLP
    decoders + dense visual embedding head (DVEFormer distillation)."""
    return MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene',
               'dense_visual_embedding'),
        backbone_rgb=None, backbone_depth=None,
        backbone_rgbd='swin-multi-t-128',
        context_module='ppm', context_n_channels=512,
        decoder_type='mlp',
        decoder_n_channels=(256, 128, 128, 128),
        encoder_decoder_fusion='swin-ln-select',
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=input_size,
        semantic_n_classes=n_classes, scene_n_classes=scene_n_classes,
        embedding_dim=embedding_dim,
        dtype=dtype,
    )


def emsaformer_dve_v2(n_classes: int = 40, scene_n_classes: int = 10,
                      embedding_dim: int = 512,
                      input_size: Tuple[int, int] = (480, 640),
                      dtype=jnp.bfloat16) -> MultiTaskModelConfig:
    """Config #5b: EMSAFormer on the SwinV2-T-128 multimodal backbone
    (reference `swin-multi-t-v2-128`; the paper's transformer variant
    with cosine attention + log-CPB). The 8x8 windows (64 tokens) are
    the TPU-aligned case: serving runs the fused Pallas window
    attention (ops/pallas/window_attention.py), so the attention
    logits never materialize in HBM."""
    import dataclasses
    return dataclasses.replace(
        emsaformer_dve(n_classes, scene_n_classes, embedding_dim,
                       input_size, dtype),
        backbone_rgbd='swin-multi-t-v2-128',
    )


BENCH_CONFIGS = {
    'resnet18_rgb_semantic': resnet18_rgb_semantic,
    'rgbd_resnet34_nbt1d_semantic': rgbd_resnet34_nbt1d_semantic,
    'panoptic_resnet34_nbt1d': panoptic_resnet34_nbt1d,
    'emsanet': emsanet,
    'emsaformer_dve': emsaformer_dve,
    'emsaformer_dve_v2': emsaformer_dve_v2,
}
