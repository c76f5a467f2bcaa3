"""Postprocessing registry (reference
model/postprocessing/__init__.py:24-44)."""
from typing import Any

from ..utils import partial_class
from .base import crop_and_resize_to_fullres
from .base import DensePostprocessingBase
from .base import PostprocessingBase
from .dense_visual_embedding import DenseVisualEmbeddingPostprocessing
from .instance import InstancePostprocessing
from .instance import segment_orientation_table
from .normal import NormalPostprocessing
from .panoptic import PanopticPostprocessing
from .scene import ScenePostprocessing
from .semantic import SemanticPostprocessing


KNOWN_POSTPROCESSINGS = (
    'semantic', 'instance', 'panoptic', 'normal', 'scene',
    'dense_visual_embedding', 'embedding',
)

_CLASSES = {
    'semantic': SemanticPostprocessing,
    'instance': InstancePostprocessing,
    'panoptic': PanopticPostprocessing,
    'normal': NormalPostprocessing,
    'scene': ScenePostprocessing,
    'dense_visual_embedding': DenseVisualEmbeddingPostprocessing,
    'embedding': DenseVisualEmbeddingPostprocessing,
}


def get_postprocessing_class(name: str, **kwargs: Any):
    name = name.lower()
    if name not in KNOWN_POSTPROCESSINGS:
        raise ValueError(f"Unknown postprocessing: '{name}'")
    if kwargs:
        return partial_class(_CLASSES[name], **kwargs)
    return _CLASSES[name]
