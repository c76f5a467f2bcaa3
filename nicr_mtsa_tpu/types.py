"""Core type aliases for the batch-dict pipeline.

The library's real API is a dict of string keys flowing through
preprocessing -> collate -> model -> postprocessing -> task helpers
(reference: types.py:11-52 and the key inventory documented in
SURVEY.md §1). Samples hold per-image numpy arrays on host;
batches hold stacked (possibly device-resident) arrays.
"""
from typing import Any, Dict, Sequence, Tuple, Union

import numpy as np

try:
    import jax
    ArrayType = Union[np.ndarray, 'jax.Array']
except Exception:  # pragma: no cover
    ArrayType = np.ndarray

# a single sample (host, numpy) or a collated batch (host or device)
SampleType = Dict[str, Any]
BatchType = Dict[str, Any]

# encoder contract (reference: model/encoder.py:52-60)
# {modality: array} for inputs/outputs; skips are
# {str(downsampling): {modality: array}}
EncoderInputType = Dict[str, ArrayType]
EncoderSkipsType = Dict[str, Dict[str, ArrayType]]
EncoderOutputType = Tuple[EncoderInputType, EncoderSkipsType]

# context module returns (features, tuple of per-bin context branches)
ContextModuleOutputType = Tuple[ArrayType, Tuple[ArrayType, ...]]

# decoders consume (context_features, context_branches) and produce
# (main_output, side_outputs); outputs may be tuples for multi-head tasks
DecoderInputType = Tuple[ArrayType, Tuple[ArrayType, ...]]
DecoderRawOutputType = Tuple[Any, Tuple[Any, ...]]

# postprocessing emits a flat dict of result keys
PostprocessingOutputType = Dict[str, Any]

# loss protocol: per-scale tuples of (loss_sum, n_elements)
LossOutputType = Tuple[Tuple[ArrayType, ArrayType], ...]

__all__ = [
    'ArrayType', 'SampleType', 'BatchType',
    'EncoderInputType', 'EncoderSkipsType', 'EncoderOutputType',
    'ContextModuleOutputType', 'DecoderInputType', 'DecoderRawOutputType',
    'PostprocessingOutputType', 'LossOutputType',
]
