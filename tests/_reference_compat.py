"""Import the READ-ONLY reference package (/root/reference/src) into
this environment for cross-framework parity tests.

The reference depends on three packages this image does not ship:
`nicr_scene_analysis_datasets` (its import-hook utilities and
OrientationDict), `cv2` (module-level import in preprocessing), and
`torchmetrics` (Metric base class). This shim installs minimal stand-
ins in sys.modules BEFORE importing the reference — just enough for
the reference's postprocessing/merge/metric modules to run unmodified;
anything that would actually need OpenCV raises at call time.

The reference PQ metric always builds a spawn multiprocessing pool
(metric/pq.py:213-218); `sync_pool_context` patches its mp context
with an inline pool so tests run the reference's own
`compare_and_accumulate` synchronously in-process.
"""
import sys
import types

import numpy as np

REFERENCE_SRC = '/root/reference/src'


def _install_stub_modules() -> None:
    if 'nicr_scene_analysis_datasets' in sys.modules:
        return

    import torch

    # --- nicr_scene_analysis_datasets ------------------------------
    nsad = types.ModuleType('nicr_scene_analysis_datasets')
    utils = types.ModuleType('nicr_scene_analysis_datasets.utils')
    imports = types.ModuleType(
        'nicr_scene_analysis_datasets.utils.imports')

    class DependencyImportHook:
        def __init__(self, module_handlers=None):
            self._handlers = module_handlers or {}

        def find_module(self, fullname, path=None):
            return None

        def find_spec(self, fullname, path=None, target=None):
            return None

    def is_package_available(package_name, raise_error=False,
                             min_version=None,
                             additional_error_msg=''):
        try:
            __import__(package_name)
            return True
        except ImportError:
            if raise_error:
                raise ImportError(
                    f'{package_name} is not available. '
                    f'{additional_error_msg}')
            return False

    imports.DependencyImportHook = DependencyImportHook
    imports.is_package_available = is_package_available

    dataset_base = types.ModuleType(
        'nicr_scene_analysis_datasets.dataset_base')

    class OrientationDict(dict):
        pass

    class SemanticLabelList(list):
        pass

    class ConcatDataset:                   # only referenced by
        def __init__(self, *a, **k):       # RandomSamplerSubset's
            raise NotImplementedError      # isinstance check

    dataset_base.OrientationDict = OrientationDict
    dataset_base.SemanticLabelList = SemanticLabelList
    nsad.ConcatDataset = ConcatDataset

    testing = types.ModuleType(
        'nicr_scene_analysis_datasets.utils.testing')
    testing.DATASET_PATH_DICT = {}
    utils.testing = testing
    sys.modules['nicr_scene_analysis_datasets.utils.testing'] = testing

    nsad.utils = utils
    utils.imports = imports
    nsad.dataset_base = dataset_base
    sys.modules['nicr_scene_analysis_datasets'] = nsad
    sys.modules['nicr_scene_analysis_datasets.utils'] = utils
    sys.modules['nicr_scene_analysis_datasets.utils.imports'] = imports
    sys.modules['nicr_scene_analysis_datasets.dataset_base'] = \
        dataset_base

    # --- cv2 (module-level import only; calls raise) ----------------
    if 'cv2' not in sys.modules:
        cv2 = types.ModuleType('cv2')

        def _unavailable(*a, **k):
            raise RuntimeError(
                'cv2 stub: OpenCV is not installed in this test '
                'environment')

        class _Missing:
            def __getattr__(self, name):
                if name.isupper():        # constants (INTER_NEAREST..)
                    return 0
                return _unavailable

        cv2.__getattr__ = _Missing().__getattr__
        sys.modules['cv2'] = cv2

    # --- torchvision (transform/backbone wrappers; parity tests only
    # touch postprocessing/merge/metrics, so classes are inert) ------
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        transforms = types.ModuleType('torchvision.transforms')
        tfunc = types.ModuleType('torchvision.transforms.functional')
        models = types.ModuleType('torchvision.models')
        swin = types.ModuleType(
            'torchvision.models.swin_transformer')
        ops = types.ModuleType('torchvision.ops')

        class _InertTransform:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                raise RuntimeError('torchvision stub: not available')

        class Compose:
            def __init__(self, transforms_):
                self.transforms = transforms_

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        class InterpolationMode:
            NEAREST = 'nearest'
            BILINEAR = 'bilinear'

        for name in ('FiveCrop', 'TenCrop', 'Resize',
                     'RandomResizedCrop'):
            setattr(transforms, name,
                    type(name, (_InertTransform,), {}))
        transforms.Compose = Compose
        transforms.functional = tfunc
        tfunc.InterpolationMode = InterpolationMode

        class Permute:
            def __init__(self, dims):
                self.dims = dims

        ops.Permute = Permute
        models.swin_transformer = swin
        tv.transforms = transforms
        tv.models = models
        tv.ops = ops
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.transforms'] = transforms
        sys.modules['torchvision.transforms.functional'] = tfunc
        sys.modules['torchvision.models'] = models
        sys.modules['torchvision.models.swin_transformer'] = swin
        sys.modules['torchvision.ops'] = ops

    # --- torchmetrics: reuse the golden harness's stub (it also
    # provides ConfusionMatrix for the reference task helpers; both
    # reference-import mechanisms must share ONE sys.modules entry --
    # a leaner stub here broke the golden-infra tests when this shim
    # installed first in a full-suite run) -------------------------
    if 'torchmetrics' not in sys.modules:
        from test_reference_golden import _ensure_stub_torchmetrics
        _ensure_stub_torchmetrics()


def import_reference():
    """Returns the imported `nicr_mt_scene_analysis` package."""
    _install_stub_modules()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import nicr_mt_scene_analysis
    return nicr_mt_scene_analysis


class _SyncResult:
    def __init__(self, value):
        self._value = value

    def get(self):
        return self._value


class _SyncPool:
    def __init__(self, processes=None):
        pass

    def apply_async(self, fn, args):
        return _SyncResult(fn(*args))

    def terminate(self):
        pass

    def close(self):
        pass

    def join(self):
        pass


class _SyncCtx:
    @staticmethod
    def Pool(processes=None):
        return _SyncPool()


def sync_pool_context():
    """Patch the reference PQ module's mp context so updates run
    inline (no spawn pool in tests)."""
    import nicr_mt_scene_analysis.metric.pq as ref_pq
    ref_pq.mp = types.SimpleNamespace(
        get_context=lambda method=None: _SyncCtx,
        cpu_count=lambda: 1)
