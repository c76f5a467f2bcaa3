"""Backbone registry (reference model/backbone/__init__.py:36-229).

Swin variants are added in models/backbones/swin.py (from-scratch NHWC
implementation); torchvision/timm checkpoint porting lives in
utils/torch_port.py."""
from typing import Any, Optional

from .base import Backbone
from .resnet import get_resnet_backbone, ResNetBackbone


KNOWN_BACKBONES = (
    'resnet18', 'resnet34', 'resnet50', 'resnet101',
    'resnet18se', 'resnet34se', 'resnet50se', 'resnet101se',
    'resnet18-d16', 'resnet34-d16', 'resnet50-d16', 'resnet101-d16',
    'swin-t', 'swin-s', 'swin-b', 'swin-t-v2', 'swin-s-v2', 'swin-b-v2',
    'swin-t-128', 'swin-t-v2-128',
    'swin-multi-t', 'swin-multi-s', 'swin-multi-b',
    'swin-multi-t-v2', 'swin-multi-s-v2', 'swin-multi-b-v2',
    'swin-multi-t-128', 'swin-multi-t-v2-128',
)


def get_backbone(
    name: str,
    resnet_block: Optional[str] = None,
    n_input_channels: int = 3,
    normalization: str = 'batchnorm',
    activation: str = 'relu',
    **kwargs: Any,
) -> Backbone:
    name = name.lower()
    if name not in KNOWN_BACKBONES:
        raise ValueError(f"Unknown backbone: '{name}'")

    if name.startswith('resnet'):
        return get_resnet_backbone(
            name, block=resnet_block,
            normalization=normalization, activation=activation,
            n_input_channels=n_input_channels, **kwargs,
        )

    from .swin import get_swin_backbone
    return get_swin_backbone(
        name, n_input_channels=n_input_channels, **kwargs,
    )
