"""Pretrained-backbone bootstrap: one call from a registry name to a
flax variables tree, with the reference's checkpoint surgery applied.

The reference auto-downloads torchvision URL checkpoints and performs
key surgery on load (model/backbone/__init__.py:140-227,
resnet.py:263-291). Here the same flow is:

    variables = load_pretrained_backbone('resnet18', n_input_channels=1)
    model_vars = merge_backbone_variables(model_vars, variables,
                                          path=('encoder', 'backbone_depth'))

Checkpoint sources, in order:
1. `checkpoint_path` argument (a torch .pth state dict),
2. `$MTSA_PRETRAINED_DIR/<name>.pth`,
3. torchvision's own weight registry + download cache (works offline
   if torch hub has the file cached; raises a clear error otherwise —
   this environment has no egress).

Only torchvision-compatible families are fetchable (resnet18/34/50/101,
swin_t/s/b); NBt1D ResNets and multimodal Swins must be ported from a
reference training run's checkpoint via `checkpoint_path`.
"""
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .torch_port import (
    adapt_first_conv, port_resnet_state_dict, port_swin_state_dict,
)

_RESNET_LAYERS = {
    'resnet18': (2, 2, 2, 2), 'resnet34': (3, 4, 6, 3),
    'resnet50': (3, 4, 6, 3), 'resnet101': (3, 4, 23, 3),
}
_SWIN_DEPTHS = {
    'swin-t': (2, 2, 6, 2), 'swin-s': (2, 2, 18, 2),
    'swin-b': (2, 2, 18, 2),
}
_TORCHVISION_NAMES = {
    'resnet18': 'resnet18', 'resnet34': 'resnet34',
    'resnet50': 'resnet50', 'resnet101': 'resnet101',
    'swin-t': 'swin_t', 'swin-s': 'swin_s', 'swin-b': 'swin_b',
}


def _load_state_dict(name: str, checkpoint_path: Optional[str]):
    import torch

    if checkpoint_path is None:
        pre_dir = os.environ.get('MTSA_PRETRAINED_DIR')
        if pre_dir:
            cand = os.path.join(pre_dir, f'{name}.pth')
            if os.path.isfile(cand):
                checkpoint_path = cand

    if checkpoint_path is not None:
        obj = torch.load(checkpoint_path, map_location='cpu',
                         weights_only=True)
        return obj.get('state_dict', obj) if isinstance(obj, dict) else obj

    tv_name = _TORCHVISION_NAMES.get(name)
    if tv_name is None:
        raise ValueError(
            f"no torchvision weights for '{name}'; pass checkpoint_path "
            f"or set $MTSA_PRETRAINED_DIR")
    try:
        import torchvision.models as tvm
        model_fn = getattr(tvm, tv_name)
        return model_fn(weights='DEFAULT').state_dict()
    except Exception as e:
        raise RuntimeError(
            f"could not fetch torchvision weights for '{name}' "
            f"(offline? set $MTSA_PRETRAINED_DIR or pass "
            f"checkpoint_path to a local .pth): {e}") from e


def load_pretrained_backbone(
    name: str,
    n_input_channels: int = 3,
    checkpoint_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Registry name -> flax variables ({'params': ...[, 'batch_stats']})
    for the matching `models.backbones` module, including the stem-conv
    channel surgery for depth (1ch) / rgbd (4ch) inputs."""
    base = name.lower()
    for suffix in ('se', '-d16', '-v2', '-128'):
        base = base.replace(suffix, '')
    base = base.replace('swin-multi', 'swin')

    state = _load_state_dict(base, checkpoint_path)

    if base.startswith('resnet'):
        return port_resnet_state_dict(
            state, layers=_RESNET_LAYERS[base],
            bottleneck=base in ('resnet50', 'resnet101'),
            n_input_channels=n_input_channels)

    if base in _SWIN_DEPTHS:
        variables = port_swin_state_dict(state,
                                         depths=_SWIN_DEPTHS[base])
        if n_input_channels != 3:
            pe = variables['params']['patch_embed']['proj']
            k = pe['kernel']                       # HWIO
            pe['kernel'] = adapt_first_conv(
                np.transpose(k, (3, 2, 0, 1)), n_input_channels
            ).transpose(2, 3, 1, 0)
        return variables

    raise ValueError(f"unknown pretrained backbone: '{name}'")


def merge_backbone_variables(
    model_variables: Dict[str, Any],
    backbone_variables: Dict[str, Any],
    path: Tuple[str, ...] = ('encoder', 'backbone_rgb'),
) -> Dict[str, Any]:
    """Graft ported backbone variables into a full model's tree at
    `path` (shape-checked leaf by leaf; extra model-side leaves — SE
    modules, heads — keep their initialization, mirroring the
    reference's strict=False load with surgery)."""
    def merge(dst, src, where):
        out = dict(dst)
        for key, val in src.items():
            if key not in out:
                raise KeyError(f'{"/".join(where)}/{key} not in model')
            if isinstance(val, dict):
                out[key] = merge(out[key], val, where + (key,))
            else:
                have = np.asarray(out[key])
                new = np.asarray(val)
                if have.shape != new.shape:
                    raise ValueError(
                        f'{"/".join(where)}/{key}: checkpoint shape '
                        f'{new.shape} != model shape {have.shape}')
                out[key] = new.astype(have.dtype)
        return out

    out = dict(model_variables)
    for col in backbone_variables:
        if col not in out:
            continue
        node = out[col] = dict(out[col])
        parents = [node]
        for p in path[:-1]:
            nxt = dict(parents[-1][p])
            parents[-1][p] = nxt
            parents.append(nxt)
        parents[-1][path[-1]] = merge(
            parents[-1][path[-1]], backbone_variables[col],
            (col,) + path)
    return out
