"""Scene postprocessing (reference model/postprocessing/scene.py)."""
import jax
import jax.numpy as jnp

from .base import PostprocessingBase


class ScenePostprocessing(PostprocessingBase):
    def __init__(self, **kwargs) -> None:
        pass

    def _postprocess_training(self, data, batch):
        output, _ = data
        return {'scene_output': output}

    def _postprocess_inference(self, data, batch):
        output, _ = data
        pred = jax.nn.softmax(output, axis=-1)
        return {
            'scene_class_score': jnp.max(pred, axis=-1),
            'scene_class_idx':
                jnp.argmax(pred, axis=-1).astype(jnp.int32),
            'scene_output': output,
        }
