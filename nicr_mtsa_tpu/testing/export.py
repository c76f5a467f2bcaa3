"""Model export for deployment.

The reference exports training graphs to ONNX for TensorRT deployment
(testing/onnx.py:14-44, env-gated). The TPU-native equivalent is
`jax.export` (StableHLO): the serialized artifact can be reloaded and
executed by any StableHLO consumer (IREE, TF, a C++ PJRT runner).
Gated by the EXPORT_STABLEHLO_MODELS env var like the reference."""
import os
from typing import Any, Optional

import jax


DO_EXPORT = os.environ.get('EXPORT_STABLEHLO_MODELS', '0') == '1'


def export_stablehlo_model(
    fn,
    example_args,
    filepath: str,
    force: bool = False,
) -> Optional[bytes]:
    """Serialize `jit(fn)` at the example arguments' shapes to a
    portable StableHLO artifact; returns the bytes (also written to
    `filepath` if given)."""
    if not (DO_EXPORT or force):
        return None

    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    if filepath:
        os.makedirs(os.path.dirname(filepath) or '.', exist_ok=True)
        with open(filepath, 'wb') as f:
            f.write(data)
    return data


def load_stablehlo_model(filepath: str):
    """Deserialize an exported model; returns the jax-callable."""
    from jax import export as jax_export
    with open(filepath, 'rb') as f:
        data = f.read()
    return jax_export.deserialize(data)
