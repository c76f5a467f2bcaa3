"""Marker types that the collate function must not stack.

Mirrors reference data/_types.py:7-19.
"""


class CollateIgnoredDict(dict):
    """A dict the collate function keeps as a per-sample list."""


class PreprocessingParameterDict(CollateIgnoredDict):
    """Provenance parameters of one applied preprocessor."""


class AppliedPreprocessingMeta(list):
    """The ordered list of applied-preprocessor parameter dicts."""


class OrientationDict(CollateIgnoredDict):
    """{instance_id: orientation_rad} mapping, kept per-sample by the
    collate function (instance ids are ragged across samples). The
    reference uses the external nicr-scene-analysis-datasets
    OrientationDict; we define our own so the framework is
    standalone."""
