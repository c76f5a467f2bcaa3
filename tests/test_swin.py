"""Swin backbone tests: stage contract, shifted windows, v2 variants,
multimodal patch embedding, encoder integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.models import get_backbone, get_encoder
from nicr_mtsa_tpu.models.backbones.swin import (
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_unpartition,
)


H, W = 64, 96


def _run(bb, x, train=False):
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = bb.init(rngs, x, train=train)
    if train:
        out, _ = bb.apply(variables, x, train=True,
                          rngs={'dropout': jax.random.PRNGKey(2)},
                          mutable=['batch_stats'])
        return out
    return bb.apply(variables, x, train=False)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 14, 28, 8)),
                    jnp.float32)
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 4, 49, 8)
    back = window_unpartition(w, 7, 14, 28)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # symmetric displacement pairs map to mirrored entries
    assert idx[0, 0] == idx[4, 4]


def test_shift_mask():
    mask = _shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    # first (unshifted-interior) window: fully visible
    assert (mask[0] == 0).all()
    # boundary windows have blocked pairs
    assert (mask[-1] < 0).any()


@pytest.mark.parametrize('name,embed', [
    ('swin-t', 96),
    ('swin-t-v2', 96),
    ('swin-t-128', 128),
])
def test_swin_backbone_shapes(name, embed):
    bb = get_backbone(name)
    x = jnp.zeros((1, H, W, 3))
    outs = _run(bb, x)
    assert len(outs) == 5
    for out, n_ch, ds in zip(outs, bb.stages_n_channels,
                             bb.stages_downsampling):
        assert out.shape == (1, H // ds, W // ds, n_ch), (name, ds)


def test_swin_multimodal():
    bb = get_backbone('swin-multi-t')
    x = jnp.zeros((1, H, W, 4))
    outs = _run(bb, x)
    assert outs[0].shape == (1, H // 4, W // 4, 96)
    assert outs[-1].shape == (1, H // 32, W // 32, 768)


def test_swin_nondivisible_input():
    # 480/32 = 15 is not a multiple of the 7x7 window: padding path
    bb = get_backbone('swin-t')
    x = jnp.zeros((1, 96, 160, 3))    # ds32 -> 3x5
    outs = _run(bb, x)
    assert outs[-1].shape == (1, 3, 5, 768)


def test_swin_encoder_and_train_mode():
    bb = get_backbone('swin-t')
    enc = get_encoder(backbone_rgb=bb)
    x = {'rgb': jnp.asarray(
        np.random.default_rng(0).normal(size=(1, H, W, 3)), jnp.float32)}
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = enc.init(rngs, x, train=False)
    out, skips = enc.apply(variables, x, train=False)
    assert out['rgb'].shape == (1, H // 32, W // 32, 768)
    assert skips['4']['rgb'].shape == (1, H // 4, W // 4, 96)
    assert skips['8']['rgb'].shape == (1, H // 8, W // 8, 192)
    assert skips['16']['rgb'].shape == (1, H // 16, W // 16, 384)

    # stochastic depth active in train mode -> differs between rng keys
    out1, _ = enc.apply(variables, x, train=True,
                        rngs={'dropout': jax.random.PRNGKey(2)})
    out2, _ = enc.apply(variables, x, train=True,
                        rngs={'dropout': jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(out1['rgb']),
                           np.asarray(out2['rgb']))
