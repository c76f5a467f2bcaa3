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
