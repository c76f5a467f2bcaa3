"""Golden tests for metrics (mIoU / RMSE / angular error), DWA loss
weighting, the CSV logger, and the checkpoint policy against the
actual reference implementation. Completes the direct-golden coverage
of SURVEY §2.5/§2.6 (losses/merge/PQ live in
tests/test_reference_golden.py, postprocessing and preprocessing in
their sibling files).
"""
import csv

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from test_reference_golden import (                # noqa: E402
    _PKG, REF_ROOT, _ensure_ref_package, ref_import, _t,
)


def _ref_import(dotted):
    """ref_import + the extra package/stub registrations this file's
    modules need (loss_weighting package, external dataset stub for
    metric.mae)."""
    import sys
    import types as pytypes
    _ensure_ref_package()
    name = f'{_PKG}.loss_weighting'
    if name not in sys.modules:
        mod = pytypes.ModuleType(name)
        mod.__path__ = [f'{REF_ROOT}/loss_weighting']
        sys.modules[name] = mod
    if 'nicr_scene_analysis_datasets' not in sys.modules:
        stub = pytypes.ModuleType('nicr_scene_analysis_datasets')
        stub.__path__ = []
        stub.OrientationDict = dict
        stub.ConcatDataset = torch.utils.data.ConcatDataset
        sys.modules['nicr_scene_analysis_datasets'] = stub
        base = pytypes.ModuleType(
            'nicr_scene_analysis_datasets.dataset_base')
        base.OrientationDict = dict
        sys.modules['nicr_scene_analysis_datasets.dataset_base'] = base
    return ref_import(dotted)


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------

@pytest.mark.parametrize('ignore_first_class', [False, True])
@pytest.mark.parametrize('seed', [0, 1])
def test_miou_golden(ignore_first_class, seed):
    ref_mod = _ref_import('metric.miou')
    from nicr_mtsa_tpu.metrics.miou import MeanIntersectionOverUnion

    C = 9
    rng = np.random.default_rng(seed)
    ref_m = ref_mod.MeanIntersectionOverUnion(
        n_classes=C, ignore_first_class=ignore_first_class)
    mine = MeanIntersectionOverUnion(
        n_classes=C, ignore_first_class=ignore_first_class)
    state = mine.empty_state()
    for _ in range(3):
        # leave some classes without GT pixels (the nan/per-class path)
        target = rng.integers(0, C - 2, size=(2, 24, 32))
        preds = rng.integers(0, C, size=(2, 24, 32))
        ref_m.update(_t(preds), _t(target))
        state = mine.update_state(state, preds, target)

    ref_miou, ref_ious = ref_m.compute(return_ious=True)
    my_miou, my_ious = mine.compute_from_state(state, return_ious=True)
    np.testing.assert_allclose(float(my_miou), float(ref_miou),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(my_ious),
                               ref_ious.numpy(), rtol=1e-6)


@pytest.mark.parametrize('with_mask', [False, True])
def test_rmse_golden(with_mask):
    ref_mod = _ref_import('metric.rmse')
    from nicr_mtsa_tpu.metrics.rmse import RootMeanSquaredError

    rng = np.random.default_rng(0)
    ref_m = ref_mod.RootMeanSquaredError()
    mine = RootMeanSquaredError()
    state = mine.empty_state()
    for _ in range(3):
        preds = rng.normal(size=(2, 16, 20, 3)).astype(np.float32)
        target = rng.normal(size=(2, 16, 20, 3)).astype(np.float32)
        mask = (rng.random((2, 16, 20)) > 0.3) if with_mask else None
        ref_m.update(_t(preds.transpose(0, 3, 1, 2)),
                     _t(target.transpose(0, 3, 1, 2)),
                     _t(mask) if with_mask else None)
        state = mine.update_state(state, preds, target, mask)

    # NOTE: the reference accumulates sqrt(MSE) per pixel then averages
    # (mean of per-pixel RMS over channels); ours matches that formula
    np.testing.assert_allclose(float(mine.compute_from_state(state)),
                               float(ref_m.compute()), rtol=1e-5)


def test_abs_angle_error_golden():
    ref_mod = _ref_import('metric.mae')
    from nicr_mtsa_tpu.metrics.mae import abs_angle_error_rad

    rng = np.random.default_rng(0)
    pred = rng.uniform(-10, 10, size=(256,))
    target = rng.uniform(-10, 10, size=(256,))
    ref_err = torch.abs(
        ref_mod.abs_angle_error_rad(_t(pred), _t(target)))
    np.testing.assert_allclose(
        np.asarray(abs_angle_error_rad(pred, target)),
        ref_err.numpy(), atol=1e-6)


# --------------------------------------------------------------------------
# DWA loss weighting
# --------------------------------------------------------------------------

def test_dwa_weights_golden():
    """Identical 3-epoch loss trajectories must yield identical
    per-epoch weights (softmax of the t-1/t-2 loss ratios)."""
    ref_mod = _ref_import('loss_weighting.dwa')
    from nicr_mtsa_tpu.weighting import DynamicWeightAverage

    keys = ('a_loss', 'b_loss', 'c_loss')
    ref_w = ref_mod.DynamicWeightAverage(
        loss_keys_to_consider=keys, temperature=2.0)
    mine = DynamicWeightAverage(
        loss_keys_to_consider=keys, temperature=2.0)

    rng = np.random.default_rng(0)
    steps_per_epoch = 4
    for epoch in range(3):
        for batch_idx in range(steps_per_epoch):
            losses = {k: float(rng.uniform(0.1, 3.0) / (epoch + 1))
                      for k in keys}
            ref_total = ref_w.reduce_losses(
                {k: torch.tensor(v) for k, v in losses.items()},
                batch_idx)
            my_total = mine.reduce_losses(dict(losses), batch_idx)
            np.testing.assert_allclose(float(my_total),
                                       float(ref_total), rtol=1e-6)
            for k in keys:
                np.testing.assert_allclose(mine.weights[k],
                                           ref_w.weights[k], rtol=1e-6)


# --------------------------------------------------------------------------
# CSV logger
# --------------------------------------------------------------------------

def test_csv_logger_golden(tmp_path):
    """Same log sequence (including a changing key set and a resume)
    must produce a CSV with the same parsed contents."""
    ref_mod = _ref_import('logging')
    from nicr_mtsa_tpu.utils import CSVLogger

    logs = [
        {'epoch': 0, 'loss': 1.5},
        {'epoch': 1, 'loss': 1.1, 'miou': 0.4},
        {'epoch': 2, 'loss': 0.9, 'miou': 0.5, 'pq': 0.2},
    ]
    ref_path, my_path = tmp_path / 'ref.csv', tmp_path / 'mine.csv'

    ref_logger = ref_mod.CSVLogger(str(ref_path))
    mine = CSVLogger(str(my_path))
    for row in logs:
        ref_logger.log(dict(row))
        mine.log(dict(row))
    ref_logger.write()
    mine.write()

    # resume: both re-read their files and append one more row
    ref_logger2 = ref_mod.CSVLogger(str(ref_path))
    mine2 = CSVLogger(str(my_path))
    ref_logger2.log({'epoch': 3, 'loss': 0.8})
    mine2.log({'epoch': 3, 'loss': 0.8})
    ref_logger2.write()
    mine2.write()

    def parse(path):
        with open(path) as f:
            return [dict(r) for r in csv.DictReader(f)]

    ref_rows, my_rows = parse(ref_path), parse(my_path)
    assert len(my_rows) == len(ref_rows) == 4
    for mine_r, ref_r in zip(my_rows, ref_rows):
        assert set(mine_r) == set(ref_r)
        for k in ref_r:
            if ref_r[k] in ('', None) or mine_r[k] in ('', None):
                assert (mine_r[k] or '') == (ref_r[k] or ''), k
            else:
                np.testing.assert_allclose(float(mine_r[k]),
                                           float(ref_r[k]), err_msg=k)


# --------------------------------------------------------------------------
# checkpoint policy
# --------------------------------------------------------------------------

def test_checkpoint_helper_golden():
    """Same metric shorthands + log sequences must produce the same
    lazy key matching, checkpoint decisions, and ckpt_* log keys."""
    ref_mod = _ref_import('checkpointing')
    from nicr_mtsa_tpu.utils import CheckpointHelper

    names = ('miou', 'rmse', 'miou+bacc')
    ref_h = ref_mod.CheckpointHelper(metric_names=names, debug=False)
    mine = CheckpointHelper(metric_names=names, debug=False)

    sequences = [
        {'valid_semantic_miou': 0.40, 'valid_normal_rmse': 0.90,
         'valid_scene_bacc': 0.50, 'train_loss': 2.0},
        {'valid_semantic_miou': 0.45, 'valid_normal_rmse': 0.95,
         'valid_scene_bacc': 0.48, 'train_loss': 1.5},
        {'valid_semantic_miou': 0.44, 'valid_normal_rmse': 0.80,
         'valid_scene_bacc': 0.60, 'train_loss': 1.2},
    ]
    for logs in sequences:
        ref_logs, my_logs = dict(logs), dict(logs)
        ref_decision = ref_h.check_for_checkpoint(ref_logs)
        my_decision = mine.check_for_checkpoint(my_logs)
        assert my_decision == ref_decision
        assert set(my_logs) == set(ref_logs)
        for k in ref_logs:
            np.testing.assert_allclose(float(my_logs[k]),
                                       float(ref_logs[k]), err_msg=k)

    assert mine.metric_mapping_joined == ref_h.metric_mapping_joined


# --------------------------------------------------------------------------
# task-helper loss collection
# --------------------------------------------------------------------------

def _ref_semantic_task_helper(**kwargs):
    """Reference SemanticTaskHelper with executed loss/metric/
    visualization packages (the bare path stubs lack attributes)."""
    import sys
    from test_reference_golden_postproc import _exec_package_init
    _ref_import('metric.mae')          # installs the dataset stub
    for pkg in ('utils', 'loss', 'metric', 'visualization', 'data'):
        name = f'{_PKG}.{pkg}'
        if not getattr(sys.modules.get(name), '__file__', None):
            keep = {k: v for k, v in sys.modules.items()
                    if k.startswith(f'{name}.')}
            _exec_package_init(name, f'{REF_ROOT}/{pkg}')
            sys.modules.update(keep)
    import types as pytypes
    # data.preprocessing stays a bare path package: its real __init__
    # imports torchvision (not installed); leaves load fine on demand
    for name, sub in (('task_helper', 'task_helper'),
                      ('data.preprocessing', 'data/preprocessing')):
        full = f'{_PKG}.{name}'
        if full not in sys.modules:
            mod = pytypes.ModuleType(full)
            mod.__path__ = [f'{REF_ROOT}/{sub}']
            sys.modules[full] = mod
    mod = ref_import('task_helper.semantic')
    helper = mod.SemanticTaskHelper(**kwargs)
    helper.initialize(torch.device('cpu'))
    return helper


@pytest.mark.parametrize('with_weights', [False, True])
def test_semantic_task_helper_losses_golden(with_weights):
    """training_step loss collection: side-output downscale inference
    from width ratios, per-scale CE, the sum/n per-key losses, and the
    total-loss accumulation must match the reference exactly."""
    from nicr_mtsa_tpu.tasks import SemanticTaskHelper

    C, B, h, w = 6, 2, 32, 48
    rng = np.random.default_rng(0)
    weights = (rng.uniform(0.5, 2.0, size=C).astype(np.float32)
               if with_weights else None)

    ref_h = _ref_semantic_task_helper(
        n_classes=C, class_weights=weights)
    mine = SemanticTaskHelper(n_classes=C, class_weights=weights)
    mine.initialize()

    logits = {ds: rng.normal(0, 2, size=(
        B, h // ds, w // ds, C)).astype(np.float32) for ds in (1, 4, 8)}
    targets = {ds: rng.integers(0, C + 1, size=(
        B, h // ds, w // ds)).astype(np.int64) for ds in (1, 4, 8)}

    ref_batch = {'semantic': _t(targets[1]),
                 '_down_4': {'semantic': _t(targets[4])},
                 '_down_8': {'semantic': _t(targets[8])}}
    ref_preds = {
        'semantic_output': _t(logits[1].transpose(0, 3, 1, 2)),
        'semantic_side_outputs': (
            _t(logits[8].transpose(0, 3, 1, 2)),
            _t(logits[4].transpose(0, 3, 1, 2))),
    }
    ref_losses, _ = ref_h.training_step(ref_batch, 0, ref_preds)

    my_batch = {'semantic': targets[1],
                '_down_4': {'semantic': targets[4]},
                '_down_8': {'semantic': targets[8]}}
    my_preds = {'semantic_output': logits[1],
                'semantic_side_outputs': (logits[8], logits[4])}
    my_losses, _ = mine.training_step(my_batch, 0, my_preds)

    assert set(my_losses) == set(ref_losses), (
        sorted(my_losses), sorted(ref_losses))
    for key in ref_losses:
        np.testing.assert_allclose(
            float(np.asarray(my_losses[key])),
            float(ref_losses[key]), rtol=1e-5, err_msg=key)


@pytest.mark.parametrize('center_loss', ['mse', 'l1'])
def test_instance_task_helper_losses_golden(center_loss):
    """Instance-branch loss collection: center MSE/L1 under the
    center mask (mask-by-zeroing + valid-pixel counts), offset L1
    under the foreground mask, and von Mises orientation on masked
    (N, 2) pixels -- per-key values and the three totals must match
    the reference."""
    from nicr_mtsa_tpu.tasks import InstanceTaskHelper

    import sys
    from test_reference_golden_postproc import _exec_package_init
    _ref_semantic_task_helper(n_classes=4)    # primes packages
    ref_mod = ref_import('task_helper.instance')
    is_thing = (False, False, True, True)
    ref_h = ref_mod.InstanceTaskHelper(
        semantic_n_classes=4, semantic_classes_is_thing=is_thing,
        loss_name_instance_center=center_loss)
    ref_h.initialize(torch.device('cpu'))
    mine = InstanceTaskHelper(
        semantic_n_classes=4, semantic_classes_is_thing=is_thing,
        loss_name_instance_center=center_loss, top_k_instances=8)
    mine.initialize()

    B, h, w = 2, 32, 48
    rng = np.random.default_rng(3)

    def scale_data(ds):
        hs, ws = h // ds, w // ds
        return {
            'pred_center': rng.random((B, hs, ws, 1)).astype(np.float32),
            'pred_offset': rng.normal(size=(B, hs, ws, 2)).astype(
                np.float32),
            'pred_ori': rng.normal(size=(B, hs, ws, 2)).astype(
                np.float32),
            'instance_center': rng.random((B, hs, ws)).astype(np.float32),
            'instance_center_mask': rng.random((B, hs, ws)) > 0.3,
            'instance_foreground': rng.random((B, hs, ws)) > 0.5,
            'instance_offset': rng.normal(size=(B, hs, ws, 2)).astype(
                np.float32),
            'orientation': rng.normal(size=(B, hs, ws, 2)).astype(
                np.float32),
            'orientation_foreground': rng.random((B, hs, ws)) > 0.6,
        }

    data = {1: scale_data(1), 4: scale_data(4)}

    def to_chw(a):
        return _t(a.transpose(0, 3, 1, 2))

    ref_batch = {}
    my_batch = {}
    for key in ('instance_center', 'instance_center_mask',
                'instance_foreground', 'instance_offset', 'orientation',
                'orientation_foreground'):
        chan = key in ('instance_offset', 'orientation')
        ref_batch[key] = (to_chw(data[1][key]) if chan
                          else _t(data[1][key]))
        my_batch[key] = data[1][key]
        ref_batch.setdefault('_down_4', {})[key] = (
            to_chw(data[4][key]) if chan else _t(data[4][key]))
        my_batch.setdefault('_down_4', {})[key] = data[4][key]

    ref_preds = {
        'instance_output': (to_chw(data[1]['pred_center']),
                            to_chw(data[1]['pred_offset']),
                            to_chw(data[1]['pred_ori'])),
        'instance_side_outputs': ((to_chw(data[4]['pred_center']),
                                   to_chw(data[4]['pred_offset']),
                                   to_chw(data[4]['pred_ori'])),),
    }
    my_preds = {
        'instance_output': (data[1]['pred_center'],
                            data[1]['pred_offset'],
                            data[1]['pred_ori']),
        'instance_side_outputs': ((data[4]['pred_center'],
                                   data[4]['pred_offset'],
                                   data[4]['pred_ori']),),
    }

    ref_losses, _ = ref_h.training_step(ref_batch, 0, ref_preds)
    my_losses, _ = mine.training_step(my_batch, 0, my_preds)

    assert set(my_losses) == set(ref_losses), (
        sorted(my_losses), sorted(ref_losses))
    for key in ref_losses:
        np.testing.assert_allclose(
            float(np.asarray(my_losses[key])),
            float(ref_losses[key]), rtol=1e-5, err_msg=key)


@pytest.mark.parametrize('loss_name', ['l1', 'mse'])
def test_normal_task_helper_losses_golden(loss_name):
    """Normal-branch loss collection: the valid mask is derived from
    non-zero GT normal vectors; mask-by-zeroing + counts must match."""
    from nicr_mtsa_tpu.tasks import NormalTaskHelper

    _ref_semantic_task_helper(n_classes=4)    # primes packages
    ref_mod = ref_import('task_helper.normal')
    ref_h = ref_mod.NormalTaskHelper(loss_name=loss_name)
    ref_h.initialize(torch.device('cpu'))
    mine = NormalTaskHelper(loss_name=loss_name)
    mine.initialize()

    B, h, w = 2, 32, 48
    rng = np.random.default_rng(5)

    def scale_data(ds):
        hs, ws = h // ds, w // ds
        normal = rng.normal(size=(B, hs, ws, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        # zero vectors = invalid GT normals (the reference's mask rule)
        normal[rng.random((B, hs, ws)) < 0.3] = 0.0
        pred = rng.normal(size=(B, hs, ws, 3)).astype(np.float32)
        return normal, pred

    data = {ds: scale_data(ds) for ds in (1, 4)}

    def to_chw(a):
        return _t(a.transpose(0, 3, 1, 2))

    ref_batch = {'normal': to_chw(data[1][0]),
                 '_down_4': {'normal': to_chw(data[4][0])}}
    my_batch = {'normal': data[1][0],
                '_down_4': {'normal': data[4][0]}}
    ref_preds = {'normal_output': to_chw(data[1][1]),
                 'normal_side_outputs': (to_chw(data[4][1]),)}
    my_preds = {'normal_output': data[1][1],
                'normal_side_outputs': (data[4][1],)}

    ref_losses, _ = ref_h.training_step(ref_batch, 0, ref_preds)
    my_losses, _ = mine.training_step(my_batch, 0, my_preds)
    assert set(my_losses) == set(ref_losses)
    for key in ref_losses:
        np.testing.assert_allclose(
            float(np.asarray(my_losses[key])),
            float(ref_losses[key]), rtol=1e-5, err_msg=key)


@pytest.mark.parametrize('with_weights', [False, True])
def test_scene_task_helper_loss_golden(with_weights):
    """Scene CE: mean reduction over non-void (label -1) targets with
    torch's weighted-mean semantics under class weights."""
    from nicr_mtsa_tpu.tasks import SceneTaskHelper

    C = 5
    rng = np.random.default_rng(7)
    weights = (rng.uniform(0.5, 2.0, size=C).astype(np.float32)
               if with_weights else None)

    _ref_semantic_task_helper(n_classes=4)    # primes packages
    ref_mod = ref_import('task_helper.scene')
    ref_h = ref_mod.SceneTaskHelper(n_classes=C, class_weights=weights)
    ref_h.initialize(torch.device('cpu'))
    mine = SceneTaskHelper(n_classes=C, class_weights=weights)
    mine.initialize()

    logits = rng.normal(0, 2, size=(6, C)).astype(np.float32)
    scene = np.array([0, 1, 2, 5, 3, 4], np.int64)   # 0 = void

    ref_losses, _ = ref_h.training_step(
        {'scene': _t(scene)}, 0, {'scene_output': _t(logits)})
    my_losses, _ = mine.training_step(
        {'scene': scene}, 0, {'scene_output': logits})
    assert set(my_losses) == set(ref_losses)
    for key in ref_losses:
        np.testing.assert_allclose(
            float(np.asarray(my_losses[key])),
            float(ref_losses[key]), rtol=1e-5, err_msg=key)


@pytest.mark.parametrize('loss_name', ['cos_emb', 'mse'])
def test_dve_task_helper_losses_golden(loss_name):
    """DVE loss: the reference reconstructs target embeddings from
    ragged per-sample LUTs + a dense index image (0 = void) with a
    python gather loop; the padded fixed-shape reconstruction here
    must produce identical masked losses."""
    from nicr_mtsa_tpu.tasks import DenseVisualEmbeddingTaskHelper

    _ref_semantic_task_helper(n_classes=4)    # primes packages
    ref_mod = ref_import('task_helper.dense_visual_embedding')
    ref_h = ref_mod.DenseVisualEmbeddingTaskHelper(
        n_classes=4, loss_name=loss_name,
        disable_multiscale_supervision=True)
    ref_h.initialize(torch.device('cpu'))
    mine = DenseVisualEmbeddingTaskHelper(
        n_classes=4, loss_name=loss_name,
        disable_multiscale_supervision=True)
    mine.initialize()

    B, h, w, D = 2, 16, 24, 8
    rng = np.random.default_rng(11)
    pred = rng.normal(size=(B, h, w, D)).astype(np.float32)
    # ragged LUTs: 3 and 5 segment embeddings
    luts = [rng.normal(size=(n, D)).astype(np.float32) for n in (3, 5)]
    indices = np.stack([
        rng.integers(0, len(luts[b]) + 1, size=(h, w))
        for b in range(B)]).astype(np.int32)       # 0 = void

    ref_batch = {
        'dense_visual_embedding_lut': [_t(l) for l in luts],
        'dense_visual_embedding_indices': _t(indices.astype(np.int64)),
    }
    my_batch = {
        'dense_visual_embedding_lut': [l for l in luts],
        'dense_visual_embedding_indices': indices,
    }
    ref_preds = {'dense_visual_embedding_output':
                 _t(pred.transpose(0, 3, 1, 2))}
    my_preds = {'dense_visual_embedding_output': pred}

    ref_losses, _ = ref_h.training_step(ref_batch, 0, ref_preds)
    my_losses, _ = mine.training_step(my_batch, 0, my_preds)
    assert set(my_losses) == set(ref_losses), (
        sorted(my_losses), sorted(ref_losses))
    for key in ref_losses:
        np.testing.assert_allclose(
            float(np.asarray(my_losses[key])),
            float(ref_losses[key]), rtol=1e-5, err_msg=key)


def test_semantic_validation_miou_update_golden():
    """validation_step metric rule: fullres preds vs fullres GT with
    void masked out and labels shifted by -1; the resulting confusion
    matrices (and mIoU) must match the reference helper's."""
    from nicr_mtsa_tpu.tasks import SemanticTaskHelper

    C, B, h, w, H0, W0 = 5, 2, 16, 24, 24, 32
    rng = np.random.default_rng(13)
    ref_h = _ref_semantic_task_helper(n_classes=C)
    mine = SemanticTaskHelper(n_classes=C)
    mine.initialize()

    logits = rng.normal(size=(B, h, w, C)).astype(np.float32)
    idx_fullres = rng.integers(0, C, size=(B, H0, W0)).astype(np.int64)
    score = rng.random((B, h, w)).astype(np.float32)
    target_fullres = rng.integers(0, C + 1, size=(B, H0, W0)).astype(
        np.int64)    # 0 = void

    side = rng.normal(size=(B, h // 4, w // 4, C)).astype(np.float32)
    targets = {'semantic': rng.integers(0, C + 1, size=(B, h, w)),
               'semantic_d4': rng.integers(0, C + 1,
                                           size=(B, h // 4, w // 4))}
    ref_batch = {'semantic': _t(targets['semantic']),
                 '_down_4': {'semantic': _t(targets['semantic_d4'])},
                 'semantic_fullres': _t(target_fullres)}
    my_batch = {'semantic': targets['semantic'],
                '_down_4': {'semantic': targets['semantic_d4']},
                'semantic_fullres': target_fullres}
    preds_common = {
        'semantic_segmentation_idx': idx_fullres[:, :h, :w],
        'semantic_segmentation_idx_fullres': idx_fullres,
        'semantic_segmentation_score': score,
    }
    ref_preds = {'semantic_output': _t(logits.transpose(0, 3, 1, 2)),
                 'semantic_side_outputs': (
                     _t(side.transpose(0, 3, 1, 2)),),
                 **{k: _t(v) for k, v in preds_common.items()}}
    my_preds = {'semantic_output': logits,
                'semantic_side_outputs': (side,), **preds_common}

    # batch_idx=1 skips the example-image rendering path
    ref_h.validation_step(ref_batch, 1, ref_preds)
    mine.validation_step(my_batch, 1, my_preds)

    ref_cm = ref_h._metric_iou.confmat.numpy()
    my_cm = np.asarray(mine._metric_iou.state)
    np.testing.assert_array_equal(my_cm, ref_cm)
