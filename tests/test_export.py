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
