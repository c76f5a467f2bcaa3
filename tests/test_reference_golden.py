"""Golden tests against the ACTUAL reference implementation.

Loads modules straight from /root/reference/src (torch + scipy are
installed; torchmetrics is stubbed with a minimal Metric base) and
asserts this framework's losses, panoptic merge, and PQ matching agree
numerically with the reference code itself — not with hand-rolled
twins. This is the accuracy-parity evidence for:

- loss/ce.py, l1.py, mse.py, vonmises.py, cos_emb.py
- utils/panoptic_merge.py (deeplab + naive merges)
- metric/pq.py compare_and_accumulate (per-class IoU/TP/FN/FP states)
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF_ROOT = '/root/reference/src/nicr_mt_scene_analysis'
_PKG = 'refmtsa'


def _ensure_stub_torchmetrics():
    if 'torchmetrics' in sys.modules:
        return
    stub = types.ModuleType('torchmetrics')

    class Metric:
        full_state_update = False

        def __init__(self, **kwargs):
            pass

        def add_state(self, name, default, dist_reduce_fx=None):
            defaults = self.__dict__.setdefault('_state_defaults', {})
            defaults[name] = default
            setattr(self, name, default.clone()
                    if hasattr(default, 'clone') else default)

        def reset(self):
            for name, default in getattr(self, '_state_defaults',
                                         {}).items():
                setattr(self, name, default.clone()
                        if hasattr(default, 'clone') else default)

        def to(self, device):
            return self

    stub.Metric = Metric

    class ConfusionMatrix(Metric):
        """Minimal stand-in (int64 confmat, bincount update) for the
        scene helper; loss goldens never read it, the reference only
        needs construction + reset to succeed."""

        def __init__(self, num_classes, **kwargs):
            import torch as _torch
            self._num_classes = num_classes
            self._defaults = {'confmat': _torch.zeros(
                (num_classes, num_classes), dtype=_torch.int64)}
            self.confmat = self._defaults['confmat'].clone()

        def reset(self):
            self.confmat = self._defaults['confmat'].clone()

        def update(self, preds, target):
            import torch as _torch
            idx = target.reshape(-1) * self._num_classes + preds.reshape(-1)
            cnts = _torch.bincount(idx, minlength=self._num_classes ** 2)
            self.confmat += cnts.reshape(self._num_classes,
                                         self._num_classes)

        def compute(self):
            return self.confmat

        def __call__(self, preds, target):
            self.update(preds, target)

    stub.ConfusionMatrix = ConfusionMatrix
    sys.modules['torchmetrics'] = stub


def _ensure_ref_package():
    """Register refmtsa{,.loss,.utils,.metric} with __path__ into the
    reference tree WITHOUT executing any reference __init__.py (those
    pull in unavailable dataset packages)."""
    if _PKG in sys.modules:
        return
    _ensure_stub_torchmetrics()
    for name, path in ((_PKG, REF_ROOT),
                       (f'{_PKG}.loss', f'{REF_ROOT}/loss'),
                       (f'{_PKG}.utils', f'{REF_ROOT}/utils'),
                       (f'{_PKG}.metric', f'{REF_ROOT}/metric')):
        mod = types.ModuleType(name)
        mod.__path__ = [path]
        sys.modules[name] = mod


def ref_import(dotted: str):
    """Import e.g. 'loss.ce' from the reference tree."""
    _ensure_ref_package()
    full = f'{_PKG}.{dotted}'
    if full in sys.modules:
        return sys.modules[full]
    parent, leaf = dotted.rsplit('.', 1) if '.' in dotted else ('', dotted)
    path = f"{REF_ROOT}/{dotted.replace('.', '/')}.py"
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def _t(x):
    return torch.tensor(np.asarray(x))


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------

@pytest.mark.parametrize('weighted,weighted_reduction,label_smoothing', [
    (False, False, 0.0),
    (True, False, 0.0),
    (True, True, 0.0),
    (False, False, 0.1),
])
def test_ce_loss_golden(weighted, weighted_reduction, label_smoothing):
    ref_ce = ref_import('loss.ce')
    from nicr_mtsa_tpu.losses import CrossEntropyLossSemantic

    rng = np.random.default_rng(0)
    B, C, H, W = 2, 7, 9, 11
    logits = rng.normal(size=(B, C, H, W)).astype(np.float32)
    target = rng.integers(0, C + 1, size=(B, H, W))   # 0 = void

    weights = rng.uniform(0.5, 2.0, size=C).astype(np.float32) \
        if weighted else None

    ref = ref_ce.CrossEntropyLossSemantic(
        weights=None if weights is None else _t(weights),
        label_smoothing=label_smoothing,
        weighted_reduction=weighted_reduction)
    ref_loss, ref_n = ref._compute_loss(_t(logits), _t(target))

    ours = CrossEntropyLossSemantic(
        weights=weights, label_smoothing=label_smoothing,
        weighted_reduction=weighted_reduction)
    j_loss, j_n = ours._compute_loss(
        logits.transpose(0, 2, 3, 1), target)

    np.testing.assert_allclose(float(j_loss), float(ref_loss),
                               rtol=2e-5, atol=2e-5)
    assert int(j_n) == int(ref_n)


@pytest.mark.parametrize('reduction', ['sum', 'mean', 'none'])
@pytest.mark.parametrize('kind', ['l1', 'mse'])
def test_elementwise_loss_golden(kind, reduction):
    ref_mod = ref_import(f'loss.{kind}')
    from nicr_mtsa_tpu.losses import L1Loss, MSELoss

    rng = np.random.default_rng(1)
    B, C, H, W = 2, 3, 6, 5
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)
    y = rng.normal(size=(B, C, H, W)).astype(np.float32)

    ref_cls = ref_mod.L1Loss if kind == 'l1' else ref_mod.MSELoss
    ref_loss, ref_n = ref_cls(reduction=reduction)._compute_loss(
        _t(x), _t(y))

    ours = (L1Loss if kind == 'l1' else MSELoss)(reduction=reduction)
    j_loss, j_n = ours._compute_loss(
        x.transpose(0, 2, 3, 1), y.transpose(0, 2, 3, 1))

    if reduction == 'none':
        # per-element losses: compare as NCHW
        np.testing.assert_allclose(
            np.asarray(j_loss).transpose(0, 3, 1, 2),
            ref_loss.numpy(), rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_allclose(float(j_loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-6)
    assert int(j_n) == int(ref_n)


def test_vonmises_loss_golden():
    ref_vm = ref_import('loss.vonmises')
    from nicr_mtsa_tpu.losses import VonMisesLossBiternion

    rng = np.random.default_rng(2)
    ang_in = rng.uniform(-np.pi, np.pi, 37)
    ang_gt = rng.uniform(-np.pi, np.pi, 37)
    x = np.stack([np.cos(ang_in), np.sin(ang_in)], -1).astype(np.float32)
    y = np.stack([np.cos(ang_gt), np.sin(ang_gt)], -1).astype(np.float32)

    for kappa in (0.5, 1.0, 2.0):
        ref_loss, ref_n = ref_vm.VonMisesLossBiternion(
            kappa=kappa)._compute_loss(_t(x), _t(y))
        j_loss, j_n = VonMisesLossBiternion(kappa=kappa)._compute_loss(x, y)
        np.testing.assert_allclose(float(j_loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-6)
        assert int(j_n) == int(ref_n)


@pytest.mark.parametrize('reduction', ['sum', 'mean'])
def test_cos_emb_loss_golden(reduction):
    ref_ce = ref_import('loss.cos_emb')
    from nicr_mtsa_tpu.losses import CosineEmbeddingLoss

    rng = np.random.default_rng(3)
    x = rng.normal(size=(23, 16)).astype(np.float32)
    y = rng.normal(size=(23, 16)).astype(np.float32)

    ref_loss, ref_n = ref_ce.CosineEmbeddingLoss(
        reduction=reduction)._compute_loss(_t(x), _t(y))
    j_loss, j_n = CosineEmbeddingLoss(
        reduction=reduction)._compute_loss(x, y)
    np.testing.assert_allclose(float(j_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    assert int(j_n) == int(ref_n)


# --------------------------------------------------------------------------
# panoptic merge
# --------------------------------------------------------------------------

def _random_panoptic_inputs(seed, B=3, H=24, W=32, n_classes=8, n_inst=6):
    """Random semantic/instance maps with blob-ish instances."""
    rng = np.random.default_rng(seed)
    semantic = rng.integers(0, n_classes, size=(B, H, W)).astype(np.int32)
    instance = np.zeros((B, H, W), np.int32)
    for b in range(B):
        for i in range(1, n_inst + 1):
            cy, cx = rng.integers(0, H), rng.integers(0, W)
            hh, ww = rng.integers(2, H // 2), rng.integers(2, W // 2)
            sem_cls = rng.integers(1, n_classes)
            sl = (slice(max(0, cy - hh // 2), min(H, cy + hh // 2 + 1)),
                  slice(max(0, cx - ww // 2), min(W, cx + ww // 2 + 1)))
            instance[b][sl] = i
            semantic[b][sl] = sem_cls
    return semantic, instance


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_deeplab_merge_golden(seed):
    ref_merge = ref_import('utils.panoptic_merge')
    from nicr_mtsa_tpu.ops.merge_np import deeplab_merge_batch_np

    thing_ids = [1, 2, 3]
    semantic, instance = _random_panoptic_inputs(seed)
    fg = np.isin(semantic, thing_ids)

    ref_pan, ref_dicts = ref_merge.deeplab_merge_batch(
        _t(semantic.astype(np.int64)), _t(instance.astype(np.int64)),
        _t(fg), 1 << 16, thing_ids, 0)

    my_pan, my_dicts = deeplab_merge_batch_np(
        semantic.astype(np.uint16), instance.astype(np.uint16), fg,
        1 << 16, thing_ids, 0)

    np.testing.assert_array_equal(my_pan.astype(np.int64),
                                  ref_pan.numpy().astype(np.int64))
    assert len(my_dicts) == len(ref_dicts)
    for mine, ref in zip(my_dicts, ref_dicts):
        assert {int(k): int(v) for k, v in mine.items()} == \
               {int(k): int(v) for k, v in ref.items()}


@pytest.mark.parametrize('seed', [0, 5])
def test_naive_merge_golden(seed):
    ref_merge = ref_import('utils.panoptic_merge')
    from nicr_mtsa_tpu.ops.merge_np import naive_merge_semantic_and_instance_np

    thing_ids = [1, 2, 3, 4]
    semantic, instance = _random_panoptic_inputs(seed, B=1)
    sem, ins = semantic[0], instance[0]

    ref_pan, ref_dict = ref_merge.naive_merge_semantic_and_instance_np(
        sem.astype(np.uint16), ins.astype(np.uint16), 1 << 16, thing_ids, 0)
    my_pan, my_dict = naive_merge_semantic_and_instance_np(
        sem.astype(np.uint16), ins.astype(np.uint16), 1 << 16, thing_ids, 0)

    np.testing.assert_array_equal(my_pan.astype(np.int64),
                                  np.asarray(ref_pan).astype(np.int64))
    assert {int(k): int(v) for k, v in my_dict.items()} == \
           {int(k): int(v) for k, v in ref_dict.items()}


# --------------------------------------------------------------------------
# PQ matching states
# --------------------------------------------------------------------------

@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_pq_states_golden(seed):
    """Reference compare_and_accumulate (the exact TF-models port the
    spawn pool parallelizes) vs this framework's device PQ states."""
    ref_pq = ref_import('metric.pq')
    from nicr_mtsa_tpu.metrics.pq import PanopticQuality

    ref_merge = ref_import('utils.panoptic_merge')
    from nicr_mtsa_tpu.ops.merge_np import deeplab_merge_batch_np

    num_categories = 8
    M = 1 << 16
    thing_ids = [1, 2, 3]

    # two different random panoptic segmentations as pred/gt
    sem_gt, ins_gt = _random_panoptic_inputs(seed, B=2)
    sem_pred, ins_pred = _random_panoptic_inputs(seed + 100, B=2)
    pan_gt, _ = deeplab_merge_batch_np(
        sem_gt.astype(np.uint16), ins_gt.astype(np.uint16),
        np.isin(sem_gt, thing_ids), M, thing_ids, 0)
    pan_pred, _ = deeplab_merge_batch_np(
        sem_pred.astype(np.uint16), ins_pred.astype(np.uint16),
        np.isin(sem_pred, thing_ids), M, thing_ids, 0)

    # reference accumulation (per image, no pool)
    ref_states = [np.zeros(num_categories, np.float64) for _ in range(4)]
    for p, t in zip(pan_pred, pan_gt):
        iou, tp, fn, fp, _ = ref_pq.compare_and_accumulate(
            _t(p.astype(np.int64)), _t(t.astype(np.int64)),
            num_categories, 0, M, 256 ** 3, 0)
        for s, v in zip(ref_states, (iou, tp, fn, fp)):
            s += v.numpy()

    metric = PanopticQuality(
        num_categories=num_categories, ignored_label=0,
        max_instances_per_category=M,
        is_thing=[c in thing_ids for c in range(num_categories)])
    state = metric.update_state(
        metric.empty_state(),
        preds=pan_pred.astype(np.int64), targets=pan_gt.astype(np.int64))

    labels = ('iou', 'tp', 'fn', 'fp')
    for name, ref_v in zip(labels, ref_states):
        mine = np.asarray(state[f'{name}_per_class'], np.float64)
        np.testing.assert_allclose(mine, ref_v, atol=1e-6,
                                   err_msg=f'{name}_per_class')
