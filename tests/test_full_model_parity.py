"""Full-model same-weights equivalence: the composed EMSANet-style
network (dual ResNet18 encoder + SE fusion + PPM context + dense
decoder ladder + semantic head) evaluated in torch with the EXACT
reference layer semantics (F.conv2d / F.batch_norm eval /
AdaptiveAvgPool2d / bilinear align_corners=False interpolation,
mirroring reference model/{encoder,encoder_fusion,context_module/ppm,
decoder/dense_base,decoder/semantic}.py) against MultiTaskModel with
the SAME weights, to the final fullres semantic logits.

The weights flow flax -> torch (no port function involved), so this
pins the semantics of every composed layer, not the porting code."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F                       # noqa: E402

from nicr_mtsa_tpu.models.multi_task import (          # noqa: E402
    MultiTaskModelConfig, build_model,
)


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def t_conv(x, p, stride=1, dilation=1, padding=None):
    """flax HWIO conv params -> torch F.conv2d (OIHW), torch-style
    symmetric padding k//2 + dilation - 1."""
    w = _t(p['kernel']).permute(3, 2, 0, 1)
    b = _t(p['bias']) if 'bias' in p else None
    k = w.shape[-1]
    pad = padding if padding is not None else k // 2 + dilation - 1
    return F.conv2d(x, w, b, stride=stride, padding=pad,
                    dilation=dilation)


def t_bn(x, p, s):
    bn, st = p['BatchNorm_0'], s['BatchNorm_0']
    return F.batch_norm(x, _t(st['mean']), _t(st['var']),
                        _t(bn['scale']), _t(bn['bias']),
                        training=False, eps=1e-5)


def t_cna(x, p, s, stride=1, act=True):
    x = t_conv(x, p['conv'], stride=stride)
    x = t_bn(x, p['norm'], s['norm'])
    return F.relu(x) if act else x


def t_se(x, p):
    w = x.mean(dim=(2, 3), keepdim=True)
    w = F.relu(t_conv(w, p['fc1']))
    w = torch.sigmoid(t_conv(w, p['fc2']))
    return x * w


def t_basicblock(x, p, s, stride=1):
    out = F.relu(t_bn(t_conv(x, p['conv1'], stride=stride),
                      p['norm1'], s['norm1']))
    out = t_bn(t_conv(out, p['conv2']), p['norm2'], s['norm2'])
    identity = x
    if 'downsample' in p:
        identity = t_cna(x, p['downsample'], s['downsample'],
                         stride=stride, act=False)
    return F.relu(out + identity)


def t_resnet18_stage(idx, x, p, s):
    """Mirror ResNetBackbone.forward_stage for basicblock resnet18."""
    if idx == 0:
        x = t_conv(x, p['conv1'], stride=2)
        return F.relu(t_bn(x, p['norm1'], s['norm1']))
    if idx == 1:
        x = F.max_pool2d(x, 3, stride=2, padding=1)
    for b in range(2):
        name = f'layer{idx}_block{b}'
        stride = 2 if (idx >= 2 and b == 0) else 1
        x = t_basicblock(x, p[name], s[name], stride=stride)
    return x


def t_bilinear(x, h, w):
    return F.interpolate(x, size=(h, w), mode='bilinear',
                         align_corners=False)


def t_ppm(x, p, s, bins=(1, 2, 3, 6)):
    h, w = x.shape[-2:]
    out = [x]
    for i, b in enumerate(bins):
        y = F.adaptive_avg_pool2d(x, b)
        y = t_cna(y, p[f'branch{i}'], s[f'branch{i}'])
        out.append(t_bilinear(y, h, w))
    return t_cna(torch.cat(out, dim=1), p['final_conv'], s['final_conv'])


def t_decoder_module(x, p, s, n_blocks, upsample):
    x = t_cna(x, p['conv'], s['conv'])
    for i in range(n_blocks):
        x = t_basicblock(x, p[f'block{i}'], s[f'block{i}'])
    if upsample:
        x = t_bilinear(x, 2 * x.shape[-2], 2 * x.shape[-1])
    return x


def t_skip_fusion(x_skip, x_dec, p, s):
    """add-rgb with 1x1 adapter (channels always differ here)."""
    return t_cna(x_skip, p['adapter'], s['adapter']) + x_dec


# ds32 features must be >= the largest PPM bin (6): with smaller maps
# the pooled branches would be DOWNsampled back, where jax.image.resize
# antialiases and torch's bilinear does not -- a regime the reference
# never runs (480x640 -> 15x20 at ds32)
H, W = 192, 256
N_CLASSES = 5
DEC_CH = (48, 32, 24)


def build_pipeline_and_params():
    config = MultiTaskModelConfig(
        tasks=('semantic',),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock',
        encoder_fusion='se-add-uni-rgb',
        context_module='ppm', context_n_channels=64,
        decoder_n_channels=DEC_CH, decoder_n_blocks=1,
        decoder_block='basicblock',
        encoder_decoder_fusion='add-rgb',
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(H, W), semantic_n_classes=N_CLASSES,
    )
    model = build_model(config)
    rgb = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, H, W, 3)), jnp.float32)
    depth = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, H, W, 1)), jnp.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'dropout': jax.random.PRNGKey(1)},
        {'rgb': rgb, 'depth': depth}, train=False)
    return model, variables, rgb, depth


def test_full_model_same_weights_logits():
    model, variables, rgb, depth = build_pipeline_and_params()
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get('batch_stats', {}))

    # flax forward
    outs = model.apply(variables, {'rgb': rgb, 'depth': depth},
                       train=False)
    logits_flax = np.asarray(outs['semantic'][0])        # (B, H, W, C)

    # torch twin forward (NCHW)
    x_rgb = _t(np.asarray(rgb).transpose(0, 3, 1, 2))
    x_depth = _t(np.asarray(depth).transpose(0, 3, 1, 2))

    enc_p, enc_s = params['encoder'], stats['encoder']
    with torch.no_grad():
        skips = {}
        for i in range(5):
            x_rgb = t_resnet18_stage(
                i, x_rgb, enc_p['backbone_rgb'], enc_s['backbone_rgb'])
            x_depth = t_resnet18_stage(
                i, x_depth, enc_p['backbone_depth'],
                enc_s['backbone_depth'])
            # se-add-uni-rgb: SE-weight both, add, feed rgb only
            fp = enc_p[f'fusion{i}']
            fused = t_se(x_rgb, fp['weighting_rgb']) \
                + t_se(x_depth, fp['weighting_depth'])
            x_rgb = fused
            ds = 4 * 2 ** max(0, i - 1)
            if i in (1, 2, 3):           # stages at ds 4, 8, 16
                skips[ds] = fused

        ctx = t_ppm(x_rgb, params['context_module'],
                    stats['context_module'])

        dp = params['semantic_decoder']
        ds_ = stats['semantic_decoder']
        x = ctx
        for i, ds in enumerate((16, 8, 4)):
            x = t_decoder_module(x, dp[f'module{i}'], ds_[f'module{i}'],
                                 n_blocks=1, upsample=True)
            x = t_skip_fusion(skips[ds], x, dp[f'fusion{i}'],
                              ds_[f'fusion{i}'])
        x = t_conv(x, dp['task_head']['conv'])
        for _ in range(2):               # prediction upsampling ds4 -> 1
            x = t_bilinear(x, 2 * x.shape[-2], 2 * x.shape[-1])

    logits_torch = x.numpy().transpose(0, 2, 3, 1)
    assert logits_torch.shape == logits_flax.shape == (2, H, W, N_CLASSES)
    # logits have magnitude ~80 with random init; measured max abs diff
    # 3.6e-4 (pure f32 accumulation-order noise across ~30 layers)
    np.testing.assert_allclose(logits_flax, logits_torch,
                               rtol=1e-3, atol=1e-3)
    assert np.abs(logits_flax - logits_torch).max() < 5e-3
