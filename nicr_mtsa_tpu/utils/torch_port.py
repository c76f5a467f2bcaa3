"""PyTorch/torchvision -> flax weight porting.

TPU-native counterpart of the reference's checkpoint surgery
(model/backbone/__init__.py:60-229 and resnet.py:263-291): load a
torchvision-style ResNet state dict into this library's NHWC flax
parameter tree, including

- `model.` / `backbone.` / `_orig_mod.` prefix stripping (DataParallel
  / DDP / torch.compile artifacts),
- fc / fc_embedding head removal,
- first-conv channel adaptation: 1-channel (depth) inputs sum the RGB
  kernels; 4-channel (rgbd) inputs append the summed kernel and halve
  the magnitude,
- OIHW -> HWIO kernel transposition, BatchNorm -> (scale, bias) +
  (mean, var) batch stats.

Used for parity testing (same weights -> same outputs as a torch
model) and for bootstrapping from ImageNet-pretrained checkpoints.
"""
from typing import Any, Dict, Tuple

import numpy as np


def _np(tensor):
    if hasattr(tensor, 'detach'):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def clean_state_dict_keys(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip wrapper prefixes and drop classifier heads."""
    out = {}
    for key, value in state_dict.items():
        new_key = key.replace('model.', '').replace('backbone.', '')
        new_key = new_key.replace('_orig_mod.', '')
        out[new_key] = value
    for head in ('fc.weight', 'fc.bias',
                 'fc_embedding.weight', 'fc_embedding.bias'):
        out.pop(head, None)
    return out


def adapt_first_conv(kernel_oihw: np.ndarray,
                     n_input_channels: int) -> np.ndarray:
    """Channel surgery on the stem conv (reference
    backbone/__init__.py:171-186)."""
    c_in = kernel_oihw.shape[1]
    if c_in == n_input_channels:
        return kernel_oihw
    if n_input_channels == 1:
        return kernel_oihw.sum(axis=1, keepdims=True)
    if n_input_channels == 4:
        summed = kernel_oihw.sum(axis=1, keepdims=True)
        return np.concatenate([kernel_oihw, summed], axis=1) / 2.0
    raise ValueError(
        f'cannot adapt {c_in}-channel conv to {n_input_channels} inputs')


def _conv(kernel_oihw) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return _np(kernel_oihw).transpose(2, 3, 1, 0)


def _bn(state, prefix):
    params = {'BatchNorm_0': {
        'scale': _np(state[f'{prefix}.weight']),
        'bias': _np(state[f'{prefix}.bias']),
    }}
    stats = {'BatchNorm_0': {
        'mean': _np(state[f'{prefix}.running_mean']),
        'var': _np(state[f'{prefix}.running_var']),
    }}
    return params, stats


def port_resnet_state_dict(
    state_dict: Dict[str, Any],
    layers: Tuple[int, ...] = (2, 2, 2, 2),
    bottleneck: bool = False,
    n_input_channels: int = 3,
) -> Dict[str, Any]:
    """torchvision ResNet state dict -> {'params': ..., 'batch_stats': ...}
    matching models/backbones/resnet.ResNetBackbone's tree.

    Accepts both torchvision naming ('bn1', 'bn2', ...) and the
    reference's renamed 'norm1'/'norm2' keys."""
    state = clean_state_dict_keys(state_dict)

    # normalize bn naming to torchvision's
    for key in list(state):
        if '.norm' in key or key.startswith('norm'):
            state[key.replace('norm', 'bn')] = state.pop(key)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    stem = adapt_first_conv(_np(state['conv1.weight']), n_input_channels)
    params['conv1'] = {'kernel': stem.transpose(2, 3, 1, 0)}
    params['norm1'], stats['norm1'] = _bn(state, 'bn1')

    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            t = f'layer{li}.{bi}'
            name = f'layer{li}_block{bi}'
            block_p: Dict[str, Any] = {}
            block_s: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                block_p[f'conv{ci}'] = {
                    'kernel': _conv(state[f'{t}.conv{ci}.weight'])}
                block_p[f'norm{ci}'], block_s[f'norm{ci}'] = \
                    _bn(state, f'{t}.bn{ci}')
            if f'{t}.downsample.0.weight' in state:
                ds_p, ds_s = _bn(state, f'{t}.downsample.1')
                block_p['downsample'] = {
                    'conv': {'kernel':
                             _conv(state[f'{t}.downsample.0.weight'])},
                    'norm': ds_p,
                }
                block_s['downsample'] = {'norm': ds_s}
            params[name] = block_p
            stats[name] = block_s

    return {'params': params, 'batch_stats': stats}


# --- Swin Transformer porting ------------------------------------------------

def _dense(weight_oi) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense (in, out)."""
    return _np(weight_oi).T


def port_swin_state_dict(
    state_dict: Dict[str, Any],
    depths: Tuple[int, ...] = (2, 2, 6, 2),
    v2: bool = False,
) -> Dict[str, Any]:
    """torchvision-style Swin state dict -> flax params for
    models/backbones/swin.SwinBackbone.

    torchvision layout: features.0 = patch embed (conv + LN);
    features.{1,3,5,7} = block stages; features.{2,4,6} = patch
    mergings; final `norm`. Patch-merging neighbor order differs
    (torchvision concatenates (0,0),(1,0),(0,1),(1,1); this framework
    uses row-major (0,0),(0,1),(1,0),(1,1)), so the reduction weight's
    input blocks are permuted accordingly.

    v2 (torchvision SwinTransformer V2 blocks): per-head `logit_scale`
    and the log-CPB MLP (`cpb_mlp.0/.2` -> `cpb_fc1`/`cpb_fc2`) port
    instead of the bias table; `relative_coords_table` /
    `relative_position_index` buffers are derived statically here and
    skipped; the patch-merging norm acts on the REDUCED 2C features,
    so only the reduction weight gets the neighbor permutation."""
    state = clean_state_dict_keys(state_dict)
    params: Dict[str, Any] = {}

    # patch embed
    params['patch_embed'] = {
        'proj': {'kernel': _conv(state['features.0.0.weight']),
                 'bias': _np(state['features.0.0.bias'])},
        'norm': {'scale': _np(state['features.0.2.weight']),
                 'bias': _np(state['features.0.2.bias'])},
    }

    for stage, depth in enumerate(depths):
        t_stage = 1 + 2 * stage
        for b in range(depth):
            t = f'features.{t_stage}.{b}'
            attn: Dict[str, Any] = {
                'qkv': {'kernel': _dense(state[f'{t}.attn.qkv.weight']),
                        'bias': _np(state[f'{t}.attn.qkv.bias'])},
                'proj': {'kernel':
                         _dense(state[f'{t}.attn.proj.weight']),
                         'bias': _np(state[f'{t}.attn.proj.bias'])},
            }
            if v2:
                attn['logit_scale'] = _np(state[f'{t}.attn.logit_scale'])
                attn['cpb_fc1'] = {
                    'kernel': _dense(state[f'{t}.attn.cpb_mlp.0.weight']),
                    'bias': _np(state[f'{t}.attn.cpb_mlp.0.bias'])}
                attn['cpb_fc2'] = {
                    'kernel': _dense(state[f'{t}.attn.cpb_mlp.2.weight'])}
            else:
                attn['relative_position_bias_table'] = _np(
                    state[f'{t}.attn.relative_position_bias_table'])
            params[f'layer{stage + 1}_block{b}'] = {
                'norm1': {'scale': _np(state[f'{t}.norm1.weight']),
                          'bias': _np(state[f'{t}.norm1.bias'])},
                'norm2': {'scale': _np(state[f'{t}.norm2.weight']),
                          'bias': _np(state[f'{t}.norm2.bias'])},
                'attn': attn,
                'mlp_fc1': {'kernel': _dense(state[f'{t}.mlp.0.weight']),
                            'bias': _np(state[f'{t}.mlp.0.bias'])},
                'mlp_fc2': {'kernel': _dense(state[f'{t}.mlp.3.weight']),
                            'bias': _np(state[f'{t}.mlp.3.bias'])},
            }
        if stage < 3:
            t = f'features.{2 + 2 * stage}'
            red = _dense(state[f'{t}.reduction.weight'])   # (4C, 2C)
            C = red.shape[0] // 4
            # neighbor-order permutation (see docstring)
            blocks = [red[0:C], red[2 * C:3 * C], red[C:2 * C],
                      red[3 * C:4 * C]]
            red = np.concatenate(blocks, axis=0)
            norm_scale = _np(state[f'{t}.norm.weight'])
            norm_bias = _np(state[f'{t}.norm.bias'])
            if not v2:
                # v1 norm acts on the concatenated 4C neighbors ->
                # permute like the reduction input; v2 norms the
                # reduced 2C output (no neighbor order to fix)
                norm_scale = np.concatenate(
                    [norm_scale[0:C], norm_scale[2 * C:3 * C],
                     norm_scale[C:2 * C], norm_scale[3 * C:4 * C]])
                norm_bias = np.concatenate(
                    [norm_bias[0:C], norm_bias[2 * C:3 * C],
                     norm_bias[C:2 * C], norm_bias[3 * C:4 * C]])
            params[f'merge{stage + 1}'] = {
                'reduction': {'kernel': red},
                'norm': {'scale': norm_scale, 'bias': norm_bias},
            }

    params['norm'] = {'scale': _np(state['norm.weight']),
                      'bias': _np(state['norm.bias'])}
    return {'params': params}
