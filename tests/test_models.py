"""Model-library contract tests (shapes, skip contracts), modeled on
tests/test_backbones.py / test_encoders.py / test_context_modules.py /
test_decoders+postprocessing.py of the reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nicr_mtsa_tpu.models import (
    get_backbone,
    get_context_module,
    get_encoder,
)
from nicr_mtsa_tpu.models.decoders import (
    InstanceDecoder,
    PanopticHelper,
    SceneClassificationDecoder,
    SemanticDecoder,
    SemanticMLPDecoder,
)
from nicr_mtsa_tpu.models.upsampling import Upsampling


H, W = 96, 128    # small canonical test resolution (divisible by 32)


def _init_and_apply(model, *args, train=False, method=None):
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = model.init(rngs, *args, train=train)
    out = model.apply(variables, *args, train=train,
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'] if train else False)
    if train:
        out, _ = out
    return out, variables


@pytest.mark.parametrize('name,block,channels', [
    ('resnet18', 'basicblock', 3),
    ('resnet34', 'nonbottleneck1d', 1),
    ('resnet50', None, 3),
    ('resnet18se', 'basicblock', 4),
    ('resnet34-d16', 'nonbottleneck1d', 3),
])
def test_resnet_backbones(name, block, channels):
    bb = get_backbone(name, resnet_block=block, n_input_channels=channels)
    x = jnp.zeros((2, H, W, channels))
    outs, _ = _init_and_apply(bb, x)

    assert len(outs) == 5
    for out, n_ch, ds in zip(outs, bb.stages_n_channels,
                             bb.stages_downsampling):
        assert out.shape == (2, H // ds, W // ds, n_ch), name


def test_backbone_train_mode_batchstats():
    bb = get_backbone('resnet18', resnet_block='basicblock')
    x = jnp.ones((2, H, W, 3))
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = bb.init(rngs, x, train=True)
    assert 'batch_stats' in variables
    outs, updates = bb.apply(
        variables, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)})
    assert 'batch_stats' in updates


def test_single_encoder_skip_contract():
    bb = get_backbone('resnet18', resnet_block='basicblock')
    enc = get_encoder(backbone_rgb=bb)
    x = {'rgb': jnp.zeros((2, H, W, 3))}
    (out, skips), _ = _init_and_apply(enc, x)

    assert set(out.keys()) == {'rgb'}
    assert out['rgb'].shape == (2, H // 32, W // 32, 512)
    assert set(skips.keys()) == {'4', '8', '16'}
    for ds, n in zip((4, 8, 16), enc.skips_n_channels):
        assert skips[str(ds)]['rgb'].shape == (2, H // ds, W // ds, n)


def test_fused_encoder():
    bb_rgb = get_backbone('resnet18', resnet_block='basicblock')
    bb_depth = get_backbone('resnet18', resnet_block='basicblock',
                            n_input_channels=1)
    enc = get_encoder(backbone_rgb=bb_rgb, backbone_depth=bb_depth,
                      fusion='se-add-uni-rgb')
    x = {'rgb': jnp.zeros((2, H, W, 3)),
         'depth': jnp.zeros((2, H, W, 1))}
    (out, skips), _ = _init_and_apply(enc, x)
    assert set(out.keys()) == {'rgb', 'depth'}
    assert out['rgb'].shape == (2, H // 32, W // 32, 512)
    assert set(skips['8'].keys()) == {'rgb', 'depth'}


def test_encoder_d16():
    bb = get_backbone('resnet18-d16', resnet_block='basicblock')
    enc = get_encoder(backbone_rgb=bb)
    x = {'rgb': jnp.zeros((2, H, W, 3))}
    (out, skips), _ = _init_and_apply(enc, x)
    assert out['rgb'].shape == (2, H // 16, W // 16, 512)
    # skip at ds 16 must come from the FIRST stage with ds 16 (stage 3)
    assert skips['16']['rgb'].shape == (2, H // 16, W // 16, 256)


@pytest.mark.parametrize('name', ['none', 'ppm', 'appm'])
def test_context_modules(name):
    cm = get_context_module(name, n_channels_in=512, n_channels_out=128,
                            input_size=(H // 32, W // 32))
    x = jnp.zeros((2, H // 32, W // 32, 512))
    (out, branches), _ = _init_and_apply(cm, x)
    assert out.shape == (2, H // 32, W // 32, 128)
    if name != 'none':
        assert len(branches) == 4
        assert branches[0].shape[1:3] == (1, 1)    # GAP branch


def test_context_module_appm_other_resolution():
    cm = get_context_module('appm', n_channels_in=64, n_channels_out=64,
                            input_size=(H // 32, W // 32))
    rngs = {'params': jax.random.PRNGKey(0)}
    x_train = jnp.zeros((1, H // 32, W // 32, 64))
    variables = cm.init(rngs, x_train, train=False)
    # double eval resolution -> bins scale, module still applies
    x_eval = jnp.zeros((1, 2 * H // 32, 2 * W // 32, 64))
    out, branches = cm.apply(variables, x_eval, train=False)
    assert out.shape == (1, 2 * H // 32, 2 * W // 32, 64)


@pytest.mark.parametrize('mode', ['nearest', 'bilinear', 'learned-3x3',
                                  'learned-3x3-zeropad'])
def test_upsampling(mode):
    up = Upsampling(mode=mode, n_channels=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 10, 8)),
                    dtype=jnp.float32)
    variables = up.init(jax.random.PRNGKey(0), x)
    y = up.apply(variables, x)
    assert y.shape == (1, 16, 20, 8)
    if 'learned' in mode:
        # initialized to mimic bilinear: interior must match bilinear x2
        y_bil = Upsampling(mode='bilinear', n_channels=8).apply({}, x)
        np.testing.assert_allclose(np.asarray(y[:, 2:-2, 2:-2]),
                                   np.asarray(y_bil[:, 2:-2, 2:-2]),
                                   atol=1e-5)


@pytest.mark.parametrize('h0,w0,h1,w1', [
    (20, 32, 40, 56),     # upscale, non-integer ratio
    (8, 10, 16, 20),      # exact x2 upscale
    (15, 20, 16, 16),     # H up (period 15->16), W down (5->4 blocks)
    (24, 20, 17, 31),     # coprime sizes -> dense fallback
    (12, 16, 7, 5),       # pure downscale
    (1, 3, 4, 6),         # degenerate single row
])
def test_resize_bilinear_matches_torch(h0, w0, h1, w1):
    """resize_bilinear implements torch F.interpolate(bilinear,
    align_corners=False, antialias=False) — the reference's fullres
    resize (model/postprocessing/dense_base.py) — on BOTH up- and
    downscales (jax.image.resize would antialias downscales)."""
    import torch
    import torch.nn.functional as F

    from nicr_mtsa_tpu.models.upsampling import resize_bilinear

    x = np.random.default_rng(3).normal(
        size=(2, h0, w0, 5)).astype(np.float32)
    mine = np.asarray(resize_bilinear(jnp.asarray(x), h1, w1))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=(h1, w1), mode='bilinear',
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(mine, ref, atol=1e-5)
    if h1 >= h0 and w1 >= w0:
        # upscales also still agree with jax.image.resize 'linear'
        viajax = np.asarray(jax.image.resize(
            jnp.asarray(x), (2, h1, w1, 5), method='linear'))
        np.testing.assert_allclose(mine, viajax, atol=1e-5)


@pytest.mark.parametrize('h0,w0,h1,w1', [
    (30, 40, 32, 32),     # the bench eval ratio family (480x640->512x512)
    (20, 32, 40, 56),     # upscale
    (15, 20, 16, 16),     # mixed up/down
    (24, 20, 17, 31),     # coprime -> dense fallback inside
    (12, 16, 7, 5),       # downscale
    (30, 40, 30, 40),     # identity
])
def test_resized_channel_reduce_matches_materializing_form(h0, w0, h1, w1):
    """resized_channel_reduce computes reduce(resize(x)) per tap phase
    (the fullres class-logits tensor never materializes -- it was the
    eval-B128 OOM, PERF.md) and must be BIT-identical to reducing the
    materialized resize: same slices, same cast/combine order."""
    from nicr_mtsa_tpu.models.upsampling import (
        resize_bilinear, resized_channel_reduce,
    )
    from nicr_mtsa_tpu.ops.pallas.semantic_reduce import (
        semantic_score_idx,
    )

    x = jnp.asarray(np.random.default_rng(11).normal(
        size=(2, h0, w0, 7)).astype(np.float32)).astype(jnp.bfloat16)
    s_ref, i_ref = semantic_score_idx(
        resize_bilinear(x.astype(jnp.float32), h1, w1))
    s, i = resized_channel_reduce(x, h1, w1, semantic_score_idx)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))


def _decoder_inputs(n_ctx=128):
    rng = np.random.default_rng(7)

    def r(*shape):
        return jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)

    enc_skips = {
        '16': {'rgb': r(2, H // 16, W // 16, 256)},
        '8': {'rgb': r(2, H // 8, W // 8, 128)},
        '4': {'rgb': r(2, H // 4, W // 4, 64)},
    }
    ctx = r(2, H // 32, W // 32, n_ctx)
    gap = r(2, 1, 1, n_ctx)
    return (ctx, (gap,)), enc_skips


def test_semantic_decoder_train_and_eval():
    dec = SemanticDecoder(
        n_channels_in=128, downsampling_in=32,
        n_channels=(256, 128, 64), downsamplings=(16, 8, 4),
        block='nonbottleneck1d', n_blocks=1,
        fusion='add-rgb', fusion_n_channels=(256, 128, 64),
        fusion_downsamplings=(16, 8, 4), n_classes=20,
    )
    x, skips = _decoder_inputs()

    (out, side), _ = _init_and_apply(dec, x, skips, train=True)
    assert out.shape == (2, H, W, 20)
    # side outputs at downscales 32, 16, 8 (before each upsample)
    assert dec.side_output_downscales == (32, 16, 8)
    assert len(side) == 3
    assert side[0].shape == (2, H // 32, W // 32, 20)
    assert side[1].shape == (2, H // 16, W // 16, 20)
    assert side[2].shape == (2, H // 8, W // 8, 20)

    (out_e, side_e), _ = _init_and_apply(dec, x, skips, train=False)
    assert out_e.shape == (2, H, W, 20)
    assert side_e == ()


def test_semantic_mlp_decoder():
    dec = SemanticMLPDecoder(
        n_channels_in=128, downsampling_in=32,
        n_channels=(128, 96, 64, 48),
        fusion='select-rgb', fusion_n_channels=(256, 128, 64),
        fusion_downsamplings=(16, 8, 4), n_classes=20,
    )
    x, skips = _decoder_inputs()
    (out, side), _ = _init_and_apply(dec, x, skips, train=True)
    assert out.shape == (2, H, W, 20)
    assert side == ()


def test_instance_decoder_with_orientation():
    dec = InstanceDecoder(
        n_channels_in=128, downsampling_in=32,
        n_channels=(256, 128, 64), downsamplings=(16, 8, 4),
        block='nonbottleneck1d', n_blocks=1,
        fusion='add-rgb', fusion_n_channels=(256, 128, 64),
        fusion_downsamplings=(16, 8, 4), with_orientation=True,
    )
    x, skips = _decoder_inputs()
    (out, side), _ = _init_and_apply(dec, x, skips, train=False)
    center, offset, orientation = out
    assert center.shape == (2, H, W, 1)
    assert offset.shape == (2, H, W, 2)
    assert orientation.shape == (2, H, W, 2)
    # center after sigmoid in (0, 1); orientation unit length
    assert float(jnp.min(center)) >= 0.0 and float(jnp.max(center)) <= 1.0
    norms = np.asarray(jnp.linalg.norm(orientation, axis=-1))
    # unit length up to the epsilon smoothing (near-zero raw vectors
    # normalize to shorter vectors by construction)
    assert (norms <= 1.0 + 1e-4).all()
    assert np.median(norms) > 0.99


def test_scene_decoder():
    dec = SceneClassificationDecoder(n_channels_in=128, n_classes=7)
    x, skips = _decoder_inputs()
    (out, side), _ = _init_and_apply(dec, x, skips, train=False)
    assert out.shape == (2, 7)


def test_panoptic_helper():
    sem = SemanticDecoder(
        n_channels_in=128, downsampling_in=32,
        n_channels=(128, 64, 32), downsamplings=(16, 8, 4),
        block='basicblock', n_blocks=1,
        fusion='add-rgb', fusion_n_channels=(256, 128, 64),
        fusion_downsamplings=(16, 8, 4), n_classes=20,
    )
    inst = InstanceDecoder(
        n_channels_in=128, downsampling_in=32,
        n_channels=(128, 64, 32), downsamplings=(16, 8, 4),
        block='basicblock', n_blocks=1,
        fusion='add-rgb', fusion_n_channels=(256, 128, 64),
        fusion_downsamplings=(16, 8, 4), with_orientation=True,
    )
    helper = PanopticHelper(semantic_decoder=sem, instance_decoder=inst)
    x, skips = _decoder_inputs()
    ((s_out, i_out), (s_side, i_side)), _ = \
        _init_and_apply(helper, x, skips, train=False)
    assert s_out.shape == (2, H, W, 20)
    assert len(i_out) == 3


def test_learned_zeropad_upsampling_fused_equivalence():
    # the fused input-dilated form must match nearest-x2 + zero-padded
    # depthwise 3x3 exactly, for an arbitrary (trained) kernel
    from jax import lax
    rng = np.random.default_rng(3)
    C = 5
    x = jnp.asarray(rng.normal(size=(2, 7, 9, C)), jnp.float32)
    up = Upsampling(mode='learned-3x3-zeropad', n_channels=C)
    variables = up.init(jax.random.PRNGKey(0), x)
    # overwrite with a random kernel/bias (simulate trained weights)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 1, C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    variables = {'params': {'kernel': kernel, 'bias': bias}}
    y = up.apply(variables, x)

    x2 = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    ref = lax.conv_general_dilated(
        x2, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=C) + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_zeropad_kernel_construction_exact():
    # the 4x4 fused kernel must equal flip(T @ K @ T^T) EXACTLY: it is
    # built from adds only (an einsum with the 0/1 T matrix routed
    # through reduced-precision matmuls on some backends and corrupted
    # trained asymmetric kernels by ~1e-3 -- regression guard)
    from nicr_mtsa_tpu.models.upsampling import fused_zeropad_2x_kernel
    rng = np.random.default_rng(0)
    C = 7
    kernel = rng.normal(size=(3, 3, 1, C)).astype(np.float32)
    kt = np.asarray(fused_zeropad_2x_kernel(jnp.asarray(kernel)))
    T = np.asarray([[0, 0, 1], [0, 1, 1], [1, 1, 0], [1, 0, 0]],
                   np.float64)
    want = np.einsum('ay,yxzc,bx->abzc', T,
                     kernel.astype(np.float64), T)[::-1, ::-1]
    # within f32 rounding of the exact value (sums of <= 4 f32 terms;
    # association order may differ from the einsum by 1 ulp)
    np.testing.assert_allclose(kt, want, rtol=3e-7, atol=1e-7)


def test_config_presets_build():
    import jax.numpy as jnp
    from nicr_mtsa_tpu.configs import BENCH_CONFIGS
    from nicr_mtsa_tpu.models.multi_task import build_model
    for name, fn in BENCH_CONFIGS.items():
        config = fn(input_size=(64, 64), dtype=jnp.float32)
        model = build_model(config)
        assert model is not None, name


def test_split_pointwise_conv_matches_concat_conv():
    """The MLP decoders' fuse(concat(branches)) runs as per-branch
    kernel-slice matmuls summed (common.py _SplitPointwiseConv): same
    parameter tree as conv-on-concat (checkpoints interchange), same
    output up to f32 accumulation order."""
    import jax
    from nicr_mtsa_tpu.models.common import ConvNormAct

    rng = np.random.default_rng(5)
    parts = tuple(
        jnp.asarray(rng.normal(size=(2, 8, 10, c)).astype(np.float32))
        for c in (12, 8, 8, 4))
    m = ConvNormAct(16, 1, norm='batchnorm', act='relu',
                    dtype=jnp.float32)

    v_split = m.init(jax.random.PRNGKey(0), parts, False)
    v_cat = m.init(jax.random.PRNGKey(0),
                   jnp.concatenate(parts, axis=-1), False)
    # identical parameter tree AND identical init values
    flat_s = jax.tree_util.tree_flatten_with_path(v_split)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(v_cat)[0]
    assert [p for p, _ in flat_s] == [p for p, _ in flat_c]
    for (path, a), (_, b) in zip(flat_s, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))

    y_split = m.apply(v_split, parts, False)
    y_cat = m.apply(v_split, jnp.concatenate(parts, axis=-1), False)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               rtol=1e-5, atol=1e-6)


def test_cnn_remat_matches_standard():
    """backbone_remat/decoder_remat on the CNN family must keep the
    parameter tree AND forward/grad values identical (checkpoints
    interchange; only the backward-pass memory schedule changes) --
    the EMSANet train B96 OOM remedy."""
    import dataclasses
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )

    config = MultiTaskModelConfig(
        tasks=('semantic', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='nonbottleneck1d',
        context_n_channels=32,
        decoder_n_channels=(16, 16, 16), decoder_n_blocks=1,
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(32, 32), semantic_n_classes=5, scene_n_classes=3)
    model = build_model(config)
    model_r = build_model(dataclasses.replace(
        config, backbone_remat=True, decoder_remat=True))

    x = {'rgb': jnp.asarray(
             np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
             jnp.float32),
         'depth': jnp.asarray(
             np.random.default_rng(1).normal(size=(2, 32, 32, 1)),
             jnp.float32)}
    init_rngs = {'params': jax.random.PRNGKey(0),
                 'dropout': jax.random.PRNGKey(9)}
    v = model.init(init_rngs, x, train=True)
    v_r = model_r.init(init_rngs, x, train=True)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v_r)

    def loss(variables, m):
        outs, _ = m.apply(
            variables, x, train=True,
            rngs={'dropout': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        sem, _ = outs['semantic']
        return jnp.sum(sem * sem) + jnp.sum(outs['scene'][0] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, model))(v)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, model_r))(v)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # recomputation reassociates f32 reductions: tiny noise only.
    # atol scales with each leaf's magnitude (grads here are O(1e4);
    # near-zero elements otherwise trip the relative check on noise)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=1e-2,
                                   atol=1e-5 * scale)
