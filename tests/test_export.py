"""StableHLO export round-trip (the deployment path; reference exports
ONNX for TensorRT, testing/onnx.py:14-44)."""
import numpy as np
import jax
import jax.numpy as jnp

from nicr_mtsa_tpu.models.multi_task import (
    MultiTaskModelConfig, build_model,
)
from nicr_mtsa_tpu.testing.export import (
    export_stablehlo_model, load_stablehlo_model,
)


def test_stablehlo_export_reload_matches(tmp_path):
    config = MultiTaskModelConfig(
        tasks=('semantic',),
        backbone_rgbd='resnet18', backbone_rgb=None, backbone_depth=None,
        resnet_block='basicblock',
        context_n_channels=32,
        decoder_n_channels=(16, 16, 16), decoder_n_blocks=1,
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(32, 32), semantic_n_classes=4,
    )
    model = build_model(config)
    rng = np.random.default_rng(0)
    inputs = {'rgbd': jnp.asarray(
        rng.normal(size=(1, 32, 32, 4)), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)

    def fn(inp):
        return model.apply(variables, inp, train=False)['semantic'][0]

    path = str(tmp_path / 'model.stablehlo')
    data = export_stablehlo_model(fn, (inputs,), path, force=True)
    assert data is not None and len(data) > 1000

    reloaded = load_stablehlo_model(path)
    out_ref = fn(inputs)
    out_new = reloaded.call(inputs)
    # the exported program recompiles with its own fusion choices;
    # logits agree to float round-off, not bit-exactly
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def test_stablehlo_export_env_gated(tmp_path):
    # without the env var or force=True, export is a no-op (reference
    # gates on EXPORT_ONNX_MODELS the same way)
    result = export_stablehlo_model(
        lambda x: x * 2, (jnp.ones((2,)),), str(tmp_path / 'x.bin'))
    assert result is None
    assert not (tmp_path / 'x.bin').exists()


def test_stablehlo_export_full_serving_program(tmp_path):
    """Export the ENTIRE fused serving program (uint8 RGB-D in ->
    panoptic maps out, incl. normalize, NMS, grouping, merge) and
    reload-match it -- the deployable artifact is the whole pipeline,
    not just the network (the reference can only ONNX-export the
    model; its postprocessing is Python)."""
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=32,
        decoder_n_channels=(16, 16, 16), decoder_n_blocks=1,
        input_size=(64, 96), semantic_n_classes=8,
    )
    model = build_model(config)
    is_thing = tuple(i < 3 for i in range(8))
    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=8),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing)
    pipe = PanopticInferencePipeline(model, post,
                                     compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3),
                                   dtype=np.uint8))
    depth = jnp.asarray(rng.integers(0, 2 ** 14, (1, 64, 96),
                                     dtype=np.uint16))
    variables = jax.jit(lambda k: model.init(
        {'params': k}, pipe.preprocess(rgb, depth), train=False)
    )(jax.random.PRNGKey(0))

    def serve(rgb_u8, depth_u16):
        return pipe._infer_impl(variables, rgb_u8, depth_u16)

    path = str(tmp_path / 'serving.stablehlo')
    data = export_stablehlo_model(serve, (rgb, depth), path, force=True)
    assert data is not None

    reloaded = load_stablehlo_model(path)
    ref = serve(rgb, depth)
    new = reloaded.call(rgb, depth)
    np.testing.assert_array_equal(np.asarray(new['panoptic']),
                                  np.asarray(ref['panoptic']))
    np.testing.assert_array_equal(np.asarray(new['semantic_idx']),
                                  np.asarray(ref['semantic_idx']))
