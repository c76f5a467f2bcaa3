"""Architectural parity: a torch ResNet-18 (torchvision semantics,
built inline) and our flax ResNetBackbone must produce the SAME
outputs from the SAME weights after porting. This validates conv
padding/stride, BN eval semantics, maxpool, and the OIHW->HWIO
conversion in utils/torch_port.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

from nicr_mtsa_tpu.models.backbones.resnet import ResNetBackbone
from nicr_mtsa_tpu.utils.torch_port import (
    adapt_first_conv, port_resnet_state_dict,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64),
                                     TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2),
                                     TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2),
                                     TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2),
                                     TorchBasicBlock(512, 512))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        outs = [x]
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


def test_resnet18_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    # make running stats non-trivial
    with torch.no_grad():
        tmodel(torch.randn(4, 3, 64, 64))
    tmodel.eval()

    variables = port_resnet_state_dict(tmodel.state_dict(),
                                       layers=(2, 2, 2, 2))

    jmodel = ResNetBackbone(block='basicblock', layers=(2, 2, 2, 2))
    x = np.random.default_rng(0).normal(size=(2, 64, 96, 3)) \
        .astype(np.float32)

    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))

    j_outs = jmodel.apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']},
        jnp.asarray(x), train=False)

    assert len(j_outs) == len(t_outs) == 5
    for i, (j, t) in enumerate(zip(j_outs, t_outs)):
        t_nhwc = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(j), t_nhwc,
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f'stage {i}')


def test_adapt_first_conv():
    k = np.random.default_rng(1).normal(size=(64, 3, 7, 7)) \
        .astype(np.float32)
    k1 = adapt_first_conv(k, 1)
    assert k1.shape == (64, 1, 7, 7)
    np.testing.assert_allclose(k1[:, 0], k.sum(axis=1), rtol=1e-6)

    k4 = adapt_first_conv(k, 4)
    assert k4.shape == (64, 4, 7, 7)
    np.testing.assert_allclose(k4[:, :3], k / 2, rtol=1e-6)
    np.testing.assert_allclose(k4[:, 3], k.sum(axis=1) / 2, rtol=1e-6)


def test_prefix_cleanup():
    torch.manual_seed(1)
    tmodel = TorchResNet18()
    sd = {f'_orig_mod.backbone.{k}': v
          for k, v in tmodel.state_dict().items()}
    sd['fc.weight'] = torch.zeros(10, 512)
    sd['fc.bias'] = torch.zeros(10)
    variables = port_resnet_state_dict(sd, layers=(2, 2, 2, 2))
    assert 'conv1' in variables['params']
    assert 'layer4_block1' in variables['params']


def test_swin_port_structural():
    """The torchvision-style Swin state dict ports into a tree the
    flax SwinBackbone can apply (shape/naming correctness)."""
    from nicr_mtsa_tpu.models.backbones.swin import SwinBackbone
    from nicr_mtsa_tpu.utils.torch_port import port_swin_state_dict

    depths, heads, embed, ws = (2, 2, 2, 2), (3, 6, 12, 24), 96, 7
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.tensor(
            rng.normal(scale=0.02, size=shape).astype(np.float32))

    sd = {
        'features.0.0.weight': t(embed, 3, 4, 4),
        'features.0.0.bias': t(embed),
        'features.0.2.weight': t(embed),
        'features.0.2.bias': t(embed),
        'norm.weight': t(embed * 8),
        'norm.bias': t(embed * 8),
    }
    for stage, depth in enumerate(depths):
        C = embed * 2 ** stage
        nh = heads[stage]
        for b in range(depth):
            p = f'features.{1 + 2 * stage}.{b}'
            sd.update({
                f'{p}.norm1.weight': t(C), f'{p}.norm1.bias': t(C),
                f'{p}.norm2.weight': t(C), f'{p}.norm2.bias': t(C),
                f'{p}.attn.qkv.weight': t(3 * C, C),
                f'{p}.attn.qkv.bias': t(3 * C),
                f'{p}.attn.proj.weight': t(C, C),
                f'{p}.attn.proj.bias': t(C),
                f'{p}.attn.relative_position_bias_table':
                    t((2 * ws - 1) ** 2, nh),
                f'{p}.mlp.0.weight': t(4 * C, C),
                f'{p}.mlp.0.bias': t(4 * C),
                f'{p}.mlp.3.weight': t(C, 4 * C),
                f'{p}.mlp.3.bias': t(C),
            })
        if stage < 3:
            p = f'features.{2 + 2 * stage}'
            sd.update({
                f'{p}.reduction.weight': t(2 * C, 4 * C),
                f'{p}.norm.weight': t(4 * C),
                f'{p}.norm.bias': t(4 * C),
            })

    variables = port_swin_state_dict(sd, depths=depths)

    bb = SwinBackbone(embed_dim=embed, depths=depths, n_heads=heads,
                      window_size=ws, stochastic_depth=0.0)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 56, 56, 3)), jnp.float32)

    # init once to know the expected tree, then assert the ported tree
    # matches structurally and is applyable
    ref = bb.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    ref_flat = jax.tree_util.tree_structure(ref['params'])
    port_flat = jax.tree_util.tree_structure(variables['params'])
    assert ref_flat == port_flat

    for (kr, vr), (kp, vp) in zip(
        jax.tree_util.tree_leaves_with_path(ref['params']),
        jax.tree_util.tree_leaves_with_path(variables['params']),
    ):
        assert vr.shape == np.asarray(vp).shape, (kr, vr.shape,
                                                  np.asarray(vp).shape)

    outs = bb.apply({'params': variables['params']}, x, train=False)
    # spatial dims halve with ceil at each merge: 14 -> 7 -> 4 -> 2
    assert outs[-1].shape == (1, 2, 2, embed * 8)
    assert np.isfinite(np.asarray(outs[-1])).all()


# --------------------------------------------------------------------------
# numeric Swin parity: inline torch Swin v1 with torchvision's exact
# shifted-window-attention semantics (the reference wraps torchvision,
# model/backbone/swin.py:18-260) vs the flax SwinBackbone with ported
# weights
# --------------------------------------------------------------------------

def _torch_shifted_window_attention(x, qkv_w, qkv_b, proj_w, proj_b,
                                    bias_table, window_size, shift_size,
                                    num_heads, logit_scale=None,
                                    cpb=None):
    """Line-for-line torchvision shifted_window_attention; v2 semantics
    (cosine attention, clamped logit scale, zeroed k bias, 16*sigmoid
    log-CPB bias) when `logit_scale`/`cpb` are given."""
    import torch.nn.functional as F
    B, H, W, C = x.shape
    ws = window_size
    pad_r = (ws - W % ws) % ws
    pad_b = (ws - H % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pad_H, pad_W, _ = x.shape

    shift = [shift_size, shift_size]
    if ws >= pad_H:
        shift[0] = 0
    if ws >= pad_W:
        shift[1] = 0

    if sum(shift) > 0:
        x = torch.roll(x, shifts=(-shift[0], -shift[1]), dims=(1, 2))

    num_windows = (pad_H // ws) * (pad_W // ws)
    x = x.view(B, pad_H // ws, ws, pad_W // ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B * num_windows, ws * ws, C)

    if logit_scale is not None and qkv_b is not None:
        qkv_b = qkv_b.clone()
        length = qkv_b.numel() // 3
        qkv_b[length:2 * length].zero_()
    qkv = F.linear(x, qkv_w, qkv_b)
    qkv = qkv.reshape(x.size(0), x.size(1), 3, num_heads,
                      C // num_heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if logit_scale is not None:
        attn = F.normalize(q, dim=-1).matmul(
            F.normalize(k, dim=-1).transpose(-2, -1))
        attn = attn * torch.clamp(
            logit_scale, max=torch.log(torch.tensor(100.0))).exp()
    else:
        q = q * (C // num_heads) ** -0.5
        attn = q.matmul(k.transpose(-2, -1))

    # relative position bias
    N = ws * ws
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing='ij'))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous() + (ws - 1)
    idx = (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).flatten()
    if cpb is not None:
        # v2 log-CPB: MLP over log-spaced relative coords, 16*sigmoid
        import torch.nn.functional as F
        r = torch.arange(-(ws - 1), ws, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(r, r, indexing='ij'), dim=-1)
        table = table / (ws - 1) * 8.0
        table = torch.sign(table) * torch.log2(
            torch.abs(table) + 1.0) / 3.0
        w1, b1, w2 = cpb
        hidden = F.relu(F.linear(table.view(-1, 2), w1, b1))
        bias_table = F.linear(hidden, w2, None)
        bias = bias_table[idx].view(N, N, -1).permute(2, 0, 1)
        bias = 16.0 * torch.sigmoid(bias)
    else:
        bias = bias_table[idx].view(N, N, -1).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)

    if sum(shift) > 0:
        attn_mask = x.new_zeros((pad_H, pad_W))
        h_slices = ((0, -ws), (-ws, -shift[0]), (-shift[0], None))
        w_slices = ((0, -ws), (-ws, -shift[1]), (-shift[1], None))
        count = 0
        for h in h_slices:
            for w in w_slices:
                attn_mask[h[0]:h[1], w[0]:w[1]] = count
                count += 1
        attn_mask = attn_mask.view(pad_H // ws, ws, pad_W // ws, ws)
        attn_mask = attn_mask.permute(0, 2, 1, 3).reshape(num_windows,
                                                          ws * ws)
        attn_mask = attn_mask.unsqueeze(1) - attn_mask.unsqueeze(2)
        attn_mask = attn_mask.masked_fill(
            attn_mask != 0, float(-100.0)).masked_fill(
            attn_mask == 0, float(0.0))
        attn = attn.view(x.size(0) // num_windows, num_windows,
                         num_heads, N, N)
        attn = attn + attn_mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, N, N)

    attn = F.softmax(attn, dim=-1)
    x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), N, C)
    x = F.linear(x, proj_w, proj_b)

    x = x.view(B, pad_H // ws, pad_W // ws, ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, pad_H, pad_W, C)

    if sum(shift) > 0:
        x = torch.roll(x, shifts=(shift[0], shift[1]), dims=(1, 2))
    return x[:, :H, :W, :].contiguous()


class _TorchSwinAttention(tnn.Module):
    def __init__(self, dim, num_heads, window_size, shift, v2=False):
        super().__init__()
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.v2 = v2
        if v2:
            self.logit_scale = tnn.Parameter(
                torch.log(10 * torch.ones((num_heads, 1, 1))))
            self.cpb_mlp = tnn.Sequential(
                tnn.Linear(2, 512, bias=True), tnn.ReLU(inplace=True),
                tnn.Linear(512, num_heads, bias=False))
        else:
            self.relative_position_bias_table = tnn.Parameter(
                torch.randn((2 * window_size - 1) ** 2, num_heads) * 0.02)
        self.window_size, self.shift = window_size, shift
        self.num_heads = num_heads

    def forward(self, x):
        if self.v2:
            return _torch_shifted_window_attention(
                x, self.qkv.weight, self.qkv.bias, self.proj.weight,
                self.proj.bias, None,
                self.window_size, self.shift, self.num_heads,
                logit_scale=self.logit_scale,
                cpb=(self.cpb_mlp[0].weight, self.cpb_mlp[0].bias,
                     self.cpb_mlp[2].weight))
        return _torch_shifted_window_attention(
            x, self.qkv.weight, self.qkv.bias, self.proj.weight,
            self.proj.bias, self.relative_position_bias_table,
            self.window_size, self.shift, self.num_heads)


class _TorchSwinBlock(tnn.Module):
    def __init__(self, dim, num_heads, window_size, shift, v2=False):
        super().__init__()
        self.v2 = v2
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TorchSwinAttention(dim, num_heads, window_size,
                                        shift, v2=v2)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential(
            tnn.Linear(dim, 4 * dim), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(4 * dim, dim), tnn.Dropout(0.0))

    def forward(self, x):
        if self.v2:                     # res-post-norm
            x = x + self.norm1(self.attn(x))
            return x + self.norm2(self.mlp(x))
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x):
        import torch.nn.functional as F
        _, H, W, _ = x.shape
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class _Permute(tnn.Module):
    def forward(self, x):
        return x.permute(0, 2, 3, 1)


class _TorchPatchMergingV2(tnn.Module):
    """torchvision PatchMergingV2: reduction first, then LN over 2C."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(2 * dim)

    def forward(self, x):
        import torch.nn.functional as F
        _, H, W, _ = x.shape
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.norm(self.reduction(x))


class _TorchSwin(tnn.Module):
    """torchvision-style swin_transformer with 4 single-block stages."""

    def __init__(self, embed=16, heads=(2, 4, 8, 16), ws=7,
                 depths=(1, 1, 1, 1), v2=False):
        super().__init__()
        merge_cls = _TorchPatchMergingV2 if v2 else _TorchPatchMerging
        feats = [tnn.Sequential(tnn.Conv2d(3, embed, 4, 4), _Permute(),
                                tnn.LayerNorm(embed))]
        for s, depth in enumerate(depths):
            dim = embed * 2 ** s
            feats.append(tnn.Sequential(*[
                _TorchSwinBlock(dim, heads[s], ws,
                                0 if b % 2 == 0 else ws // 2, v2=v2)
                for b in range(depth)]))
            if s < len(depths) - 1:
                feats.append(merge_cls(dim))
        self.features = tnn.Sequential(*feats)
        self.norm = tnn.LayerNorm(embed * 2 ** (len(depths) - 1))

    def forward(self, x):
        outs = []
        x = self.features[0](x)
        outs.append(x)
        i = 1
        while i < len(self.features):
            if i > 1:
                x = self.features[i](x)   # merge
                i += 1
            x = self.features[i](x)       # blocks
            i += 1
            outs.append(x)
        outs[-1] = self.norm(outs[-1])
        return outs


@pytest.mark.parametrize('hw', [(112, 140), (28, 28)])
def test_swin_forward_parity(hw):
    """Numeric weight-port parity across all 4 stages, at a size with
    active shifts + padding (112x140) and at a degenerate size where
    torchvision disables the shift per-dim (28x28 -> 7x7 features)."""
    from nicr_mtsa_tpu.models.backbones.swin import SwinBackbone
    from nicr_mtsa_tpu.utils.torch_port import port_swin_state_dict

    torch.manual_seed(0)
    depths, heads, embed, ws = (1, 2, 1, 1), (2, 4, 8, 16), 16, 7
    tmodel = _TorchSwin(embed=embed, heads=heads, ws=ws,
                        depths=depths).eval()

    variables = port_swin_state_dict(tmodel.state_dict(), depths=depths)

    jmodel = SwinBackbone(embed_dim=embed, depths=depths, n_heads=heads,
                          window_size=ws, stochastic_depth=0.0)

    H, W = hw
    x = np.random.default_rng(0).normal(size=(2, H, W, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_outs = jmodel.apply({'params': variables['params']},
                          jnp.asarray(x), train=False)

    assert len(j_outs) == len(t_outs) == 5
    for i, (j, t) in enumerate(zip(j_outs, t_outs)):
        np.testing.assert_allclose(np.asarray(j), t.numpy(),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f'stage {i}')


@pytest.mark.parametrize('attn_backend', ['xla', 'pallas-interpret'])
def test_swin_v2_forward_parity(attn_backend):
    """Numeric weight-port parity for SwinV2 (cosine attention with
    clamped logit scale, zeroed k bias, log-CPB MLP bias, res-post-norm
    blocks, PatchMergingV2) across all 4 stages -- via the XLA einsum
    path AND the fused Pallas window-attention kernel (interpret).
    The v2 window size is 8 (64 tokens), the fused kernel's native
    shape."""
    from nicr_mtsa_tpu.models.backbones.swin import SwinBackbone
    from nicr_mtsa_tpu.utils.torch_port import port_swin_state_dict

    torch.manual_seed(1)
    depths, heads, embed, ws = (1, 1, 1, 1), (2, 4, 8, 16), 16, 8
    tmodel = _TorchSwin(embed=embed, heads=heads, ws=ws,
                        depths=depths, v2=True).eval()

    variables = port_swin_state_dict(tmodel.state_dict(), depths=depths,
                                     v2=True)

    jmodel = SwinBackbone(embed_dim=embed, depths=depths, n_heads=heads,
                          window_size=ws, v2=True, stochastic_depth=0.0,
                          attn_backend=attn_backend, ln_backend='xla')

    x = np.random.default_rng(5).normal(size=(2, 64, 96, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_outs = jmodel.apply({'params': variables['params']},
                          jnp.asarray(x), train=False)

    assert len(j_outs) == len(t_outs) == 5
    for i, (j, t) in enumerate(zip(j_outs, t_outs)):
        np.testing.assert_allclose(np.asarray(j), t.numpy(),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f'stage {i}')


def test_pretrained_bootstrap_from_local_checkpoint(tmp_path):
    """One-call pretrained flow: torch .pth on disk -> ported backbone
    variables (with depth-stem surgery) -> grafted into a full model's
    tree; forward stays numerically tied to the torch source."""
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.utils.pretrained import (
        load_pretrained_backbone, merge_backbone_variables,
    )

    torch.manual_seed(3)
    tmodel = TorchResNet18().eval()
    path = tmp_path / 'resnet18.pth'
    torch.save(tmodel.state_dict(), str(path))

    # rgb backbone: exact forward parity through the bootstrap
    variables = load_pretrained_backbone(
        'resnet18', n_input_channels=3, checkpoint_path=str(path))
    bb = ResNetBackbone(layers=(2, 2, 2, 2), block='basicblock')
    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_outs = bb.apply(variables, jnp.asarray(x), train=False)
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)

    # depth backbone (1-channel stem surgery) grafted into a model
    config = MultiTaskModelConfig(
        tasks=('semantic',),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=32,
        decoder_n_channels=(16, 16, 16), decoder_n_blocks=1,
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(64, 96), semantic_n_classes=4,
    )
    model = build_model(config)
    mv = model.init(
        {'params': jax.random.PRNGKey(0),
         'dropout': jax.random.PRNGKey(1)},
        {'rgb': jnp.zeros((1, 64, 96, 3)),
         'depth': jnp.zeros((1, 64, 96, 1))}, train=False)

    rgb_vars = load_pretrained_backbone(
        'resnet18', n_input_channels=3, checkpoint_path=str(path))
    depth_vars = load_pretrained_backbone(
        'resnet18', n_input_channels=1, checkpoint_path=str(path))
    mv = merge_backbone_variables(dict(mv), rgb_vars,
                                  path=('encoder', 'backbone_rgb'))
    mv = merge_backbone_variables(mv, depth_vars,
                                  path=('encoder', 'backbone_depth'))

    # grafted stem == ported checkpoint, surgery applied for depth
    graft = np.asarray(
        mv['params']['encoder']['backbone_rgb']['conv1']['kernel'])
    np.testing.assert_array_equal(
        graft, np.asarray(rgb_vars['params']['conv1']['kernel']))
    dstem = np.asarray(
        mv['params']['encoder']['backbone_depth']['conv1']['kernel'])
    assert dstem.shape[2] == 1
    expect = adapt_first_conv(
        tmodel.state_dict()['conv1.weight'].numpy(), 1)
    np.testing.assert_allclose(dstem, expect.transpose(2, 3, 1, 0),
                               rtol=1e-6)

    # the grafted model still runs
    outs = model.apply(mv, {'rgb': jnp.zeros((1, 64, 96, 3)),
                            'depth': jnp.zeros((1, 64, 96, 1))},
                       train=False)
    assert np.isfinite(np.asarray(outs['semantic'][0])).all()
