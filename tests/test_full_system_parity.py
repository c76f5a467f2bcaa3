"""Composed cross-framework eval equality: the REFERENCE's own torch
eval stack (PanopticPostprocessing -> CPU deeplab merge -> PQ / mIoU,
imported unmodified from /root/reference via tests/_reference_compat)
and this repo's fused jit eval step (postprocessing -> device merge ->
device metric states) consume the SAME model raw outputs over the same
synthetic val set, and the FINAL metric values must agree.

Together with tests/test_full_model_parity.py (same-weights logits
equality vs an exact torch twin) this closes the accuracy-parity
chain end to end: model -> logits -> postprocessing -> merge ->
metrics. Reference anchor: tests/test_metrics.py:494-647 (the GT
round-trip harness this generalizes to arbitrary network outputs).

The fused-step test excludes orientation MAE (that path consumes
host-precomputed angle tables); the second test covers it through the
non-fused validation path: both frameworks' PanopticQuality-with-MAE
metrics consume identical raw outputs (incl. the orientation head)
and the final mae_rad/deg must also agree.
"""
import sys
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.dirname(__file__))
from _reference_compat import import_reference, sync_pool_context  # noqa: E402

from nicr_mtsa_tpu.data import mt_collate                          # noqa: E402
from nicr_mtsa_tpu.data.preprocessing import (                     # noqa: E402
    Compose, FullResCloner, InstanceClearStuffIDs,
    InstanceTargetGenerator, MultiscaleSupervisionGenerator,
    NormalizeDepth, NormalizeRGB, OrientationTargetGenerator,
    PanopticTargetGenerator, Resize, ToDeviceArrays,
)
from nicr_mtsa_tpu.data.preprocessing.base import (                # noqa: E402
    APPLIED_PREPROCESSING_KEY,
)
from nicr_mtsa_tpu.models.multi_task import (                      # noqa: E402
    MultiTaskModelConfig, build_model,
)
from nicr_mtsa_tpu.pipeline import (                               # noqa: E402
    MultiTaskPipeline, default_postprocessors, strip_non_arrays,
)
from nicr_mtsa_tpu.tasks import (                                  # noqa: E402
    InstanceTaskHelper, PanopticTaskHelper, SemanticTaskHelper,
)
from nicr_mtsa_tpu.testing.dataset import SyntheticRGBDDataset     # noqa: E402

FULL_H, FULL_W = 120, 160
H, W = 96, 128
N_WITH_VOID = 11
IS_THING = tuple(i in (1, 2, 3) for i in range(N_WITH_VOID))
TOP_K = 32
M = 1 << 16


def _make_batch():
    # get_dummy_sample draws from the global np.random state: pin it
    # so the val set (and hence the compared metric values) is stable
    # with or without pytest's seeding fixture
    np.random.seed(12345)
    pre = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=IS_THING),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=H, width=W),
        InstanceTargetGenerator(sigma=8,
                                semantic_classes_is_thing=IS_THING),
        PanopticTargetGenerator(semantic_classes_is_thing=IS_THING),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])
    ds = SyntheticRGBDDataset(n_samples=4, height=FULL_H, width=FULL_W,
                              preprocessor=pre)
    return mt_collate([ds[i] for i in range(4)])


def _build():
    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=64,
        decoder_n_channels=(64, 48, 32), decoder_n_blocks=1,
        input_size=(H, W), semantic_n_classes=N_WITH_VOID - 1,
    )
    return build_model(config)


def _jax_eval(model, batch):
    """Fused eval step -> final metric values (this repo's stack)."""
    helpers = {
        'semantic': SemanticTaskHelper(n_classes=N_WITH_VOID - 1),
        'instance': InstanceTaskHelper(
            semantic_n_classes=N_WITH_VOID,
            semantic_classes_is_thing=IS_THING,
            top_k_instances=TOP_K),
        'panoptic': PanopticTaskHelper(
            semantic_n_classes=N_WITH_VOID,
            semantic_classes_is_thing=IS_THING),
    }
    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=('semantic', 'instance', 'panoptic'),
            semantic_classes_is_thing=IS_THING[1:],
            top_k_instances=TOP_K),
        task_helpers=helpers)
    static_batch = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY]}
    step = pipeline.make_fused_eval_step(static_batch, output_keys=())
    arrays = jax.tree_util.tree_map(jax.device_put,
                                    strip_non_arrays(batch))
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(arrays))
    states = {n: h.empty_metric_states() for n, h in helpers.items()
              if hasattr(h, 'empty_metric_states')}
    _, _, states = step(state['params'], state['batch_stats'],
                        arrays, states)
    logs = {}
    for n, h in helpers.items():
        if n in states and hasattr(h, 'load_metric_states'):
            h.load_metric_states(states[n])
            _, _, l = h.validation_epoch_end()
            logs.update({k: float(v) for k, v in l.items()
                         if np.ndim(v) == 0})
    return state, logs


def _raw_outputs(model, state, batch):
    """Model raw per-task outputs (no postprocessing), f32 numpy."""
    arrays = strip_non_arrays(batch)
    inputs = {'rgb': jnp.asarray(arrays['rgb']),
              'depth': jnp.asarray(arrays['depth'])}
    variables = {'params': state['params'],
                 'batch_stats': state['batch_stats']}
    out = model.apply(variables, inputs, train=False)
    sem_main, _ = out['semantic']
    (center, offset), _ = out['instance']
    return (np.asarray(sem_main, np.float32),
            np.asarray(center, np.float32),
            np.asarray(offset, np.float32))


def _torch_eval(batch, sem_logits, center, offset):
    """The reference's own composed eval on the same raw outputs."""
    ref = import_reference()
    sync_pool_context()
    from nicr_mt_scene_analysis.model.postprocessing import (
        get_postprocessing_class,
    )
    from nicr_mt_scene_analysis import metric as ref_metric

    t = torch.tensor
    batch_t = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
        'instance_foreground':
            t(np.asarray(batch['instance_foreground'])),
        # CHW fullres backup: the reference reads shape[-2:]
        'rgb_fullres': t(np.asarray(batch['rgb_fullres'])
                         .transpose(0, 3, 1, 2)),
    }

    post = get_postprocessing_class('panoptic')(
        semantic_postprocessing=get_postprocessing_class('semantic')(),
        instance_postprocessing=get_postprocessing_class('instance')(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=TOP_K),
        semantic_classes_is_thing=IS_THING[1:],
        semantic_class_has_orientation=IS_THING[1:],
    )

    sem_t = t(sem_logits.transpose(0, 3, 1, 2))        # NCHW
    center_t = t(center.transpose(0, 3, 1, 2))         # (B, 1, H, W)
    offset_t = t(offset.transpose(0, 3, 1, 2))         # (B, 2, H, W)
    data = ((sem_t, (center_t, offset_t)), (None, None))
    with torch.no_grad():
        result = post.postprocess(data, batch_t, is_training=False)

    logs = {}

    # semantic mIoU exactly as reference task_helper/semantic.py:110-128
    gt_sem = t(np.asarray(batch['semantic_fullres']).astype(np.int64))
    miou = ref_metric.MeanIntersectionOverUnion(
        n_classes=N_WITH_VOID - 1)
    mask = gt_sem != 0
    preds = result['semantic_segmentation_idx_fullres'][mask]
    miou.update(preds=preds, target=gt_sem[mask] - 1)
    logs['semantic_miou'] = float(miou.compute())

    # PQ exactly as reference task_helper/panoptic.py:104-126 (PQ part)
    pq = ref_metric.PanopticQuality(
        num_categories=N_WITH_VOID, ignored_label=0,
        max_instances_per_category=M, offset=256 ** 3,
        is_thing=list(IS_THING))
    pan_pred = result['panoptic_segmentation_deeplab_fullres'] \
        .to(torch.int64).cpu()
    pan_gt = t(np.asarray(batch['panoptic_fullres']).astype(np.int64))
    pq.update(pan_pred, pan_gt)
    for k, v in pq.compute().items():
        if np.ndim(v) == 0:
            logs[f'panoptic_{k}_deeplab' if not k.startswith('panoptic')
                 else k] = float(v)

    # panoptic-derived semantic mIoU (reference panoptic.py:121-126)
    miou2 = ref_metric.MeanIntersectionOverUnion(
        n_classes=N_WITH_VOID, ignore_first_class=True)
    miou2.update(preds=pan_pred // M, target=gt_sem)
    logs['panoptic_deeplab_semantic_miou'] = float(miou2.compute())
    return logs, result


def test_full_system_metric_parity():
    batch = _make_batch()
    model = _build()
    state, jax_logs = _jax_eval(model, batch)
    sem_logits, center, offset = _raw_outputs(model, state, batch)
    ref_logs, _ = _torch_eval(batch, sem_logits, center, offset)

    # key map: ref 'panoptic_all_pq_deeplab' style -> ours
    pairs = [('semantic_miou', 'semantic_miou'),
             ('panoptic_deeplab_semantic_miou',
              'panoptic_deeplab_semantic_miou')]
    for grp in ('all', 'things', 'stuff'):
        for m in ('pq', 'sq', 'rq'):
            pairs.append((f'panoptic_{grp}_{m}_deeplab',
                          f'panoptic_{grp}_deeplab_{m}'))
            pairs.append((f'panoptic_{grp}_with_gt_{m}_deeplab',
                          f'panoptic_{grp}_with_gt_deeplab_{m}'))

    mismatches = []
    for ref_key, jax_key in pairs:
        assert ref_key in ref_logs, (ref_key, sorted(ref_logs))
        assert jax_key in jax_logs, (jax_key, sorted(jax_logs))
        r, j = ref_logs[ref_key], jax_logs[jax_key]
        if not np.isclose(r, j, rtol=1e-3, atol=1e-3):
            mismatches.append((ref_key, r, j))
    assert not mismatches, mismatches

    # the synthetic GT has real structure: metrics must be nontrivial
    # for the comparison to mean anything
    assert ref_logs['semantic_miou'] > 0.0
    assert 0.0 <= ref_logs['panoptic_all_pq_deeplab'] <= 1.0


# ---------------------------------------------------------------------
# Orientation-MAE parity through the NON-fused validation path
# ---------------------------------------------------------------------

def _make_batch_with_orientation():
    np.random.seed(54321)
    pre = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=IS_THING),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=H, width=W),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32),
            keys=('semantic', 'instance', 'orientations')),
        InstanceTargetGenerator(sigma=8,
                                semantic_classes_is_thing=IS_THING),
        OrientationTargetGenerator(
            semantic_classes_estimate_orientation=IS_THING),
        PanopticTargetGenerator(semantic_classes_is_thing=IS_THING),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])
    ds = SyntheticRGBDDataset(n_samples=4, height=FULL_H, width=FULL_W,
                              preprocessor=pre)
    return mt_collate([ds[i] for i in range(4)])


def _gt_outputs(batch):
    """GT-encoded 'network outputs' (the reference's own round-trip
    harness recipe, tests/test_metrics.py:538-552): one-hot semantic
    logits, the batch's center/offset encodings, and the dense
    biternion image rotated by a deterministic position-dependent
    perturbation so the matched-instance MAE is NONZERO and both
    frameworks must reproduce the same readout + matching."""
    semantic = np.asarray(batch['semantic']).astype(np.int64)
    B, Hh, Ww = semantic.shape
    sem = np.zeros((B, Hh, Ww, N_WITH_VOID - 1), np.float32)
    for c in range(1, N_WITH_VOID):
        sem[..., c - 1][semantic == c] = 1.0
    center = np.asarray(batch['instance_center'],
                        np.float32).reshape(B, Hh, Ww, 1)
    offset = np.asarray(batch['instance_offset'], np.float32)
    ori = np.asarray(batch['orientation'], np.float32)
    yy = np.linspace(0, 2 * np.pi, Hh, dtype=np.float32)[None, :, None]
    eps = 0.2 * np.sin(yy)                     # rotation angle per row
    cos_e, sin_e = np.cos(eps), np.sin(eps)
    rot = np.stack([ori[..., 0] * cos_e - ori[..., 1] * sin_e,
                    ori[..., 0] * sin_e + ori[..., 1] * cos_e], axis=-1)
    return sem, center, offset, rot.astype(np.float32)


def test_full_system_orientation_mae_parity():
    batch = _make_batch_with_orientation()
    sem, center, offset, orientation = _gt_outputs(batch)

    helpers = {
        'panoptic': PanopticTaskHelper(
            semantic_n_classes=N_WITH_VOID,
            semantic_classes_is_thing=IS_THING),
    }
    postprocessors = default_postprocessors(
        tasks=('semantic', 'instance', 'orientation', 'panoptic'),
        semantic_classes_is_thing=IS_THING[1:],
        top_k_instances=TOP_K)

    # our stack: postprocess the GT-encoded outputs, run the panoptic
    # helper's validation update + epoch end
    raw = ((jnp.asarray(sem),
            (jnp.asarray(center), jnp.asarray(offset),
             jnp.asarray(orientation))),
           (None, None))
    arrays = strip_non_arrays(batch)
    b = dict(arrays)
    b[APPLIED_PREPROCESSING_KEY] = batch[APPLIED_PREPROCESSING_KEY]
    preds = postprocessors['panoptic'].postprocess(
        raw, b, is_training=False)
    full_batch = dict(batch)
    helpers['panoptic'].validation_step(full_batch, 0, preds)
    jax_logs = {}
    for h in helpers.values():
        _, _, l = h.validation_epoch_end()
        jax_logs.update({k: float(v) for k, v in l.items()
                         if np.ndim(v) == 0})

    import_reference()
    sync_pool_context()
    from nicr_mt_scene_analysis.model.postprocessing import (
        get_postprocessing_class,
    )
    from nicr_mt_scene_analysis import metric as ref_metric

    t = torch.tensor
    batch_t = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
        'instance_foreground':
            t(np.asarray(batch['instance_foreground'])),
        'orientation_foreground':
            t(np.asarray(batch['orientation_foreground'])),
        'instance': t(np.asarray(batch['instance']).astype(np.int64)),
        'rgb_fullres': t(np.asarray(batch['rgb_fullres'])
                         .transpose(0, 3, 1, 2)),
    }
    post = get_postprocessing_class('panoptic')(
        semantic_postprocessing=get_postprocessing_class('semantic')(),
        instance_postprocessing=get_postprocessing_class('instance')(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=TOP_K),
        semantic_classes_is_thing=IS_THING[1:],
        semantic_class_has_orientation=IS_THING[1:],
    )
    data = ((t(sem.transpose(0, 3, 1, 2)),
             (t(center.transpose(0, 3, 1, 2)),
              t(offset.transpose(0, 3, 1, 2)),
              t(orientation.transpose(0, 3, 1, 2)))),
            (None, None))
    with torch.no_grad():
        result = post.postprocess(data, batch_t, is_training=False)

    pq = ref_metric.PanopticQualityWithOrientationMAE(
        num_categories=N_WITH_VOID, ignored_label=0,
        max_instances_per_category=M, offset=256 ** 3,
        is_thing=list(IS_THING))
    pq.update(
        panoptic_preds=result['panoptic_segmentation_deeplab_fullres']
        .to(torch.int64).cpu(),
        orientation_preds=result[
            'orientations_panoptic_segmentation_deeplab_instance'],
        panoptic_preds_id_dicts=result[
            'panoptic_segmentation_deeplab_ids'],
        panoptic_target=t(np.asarray(batch['panoptic_fullres'])
                          .astype(np.int64)),
        orientation_target=batch['orientations_present'],
        panoptic_target_id_dicts=batch[
            'panoptic_ids_to_instance_dict_fullres'])
    ref_logs = {k: float(v) for k, v in pq.compute().items()
                if np.ndim(v) == 0}

    # MAE must be computed over at least one matched oriented instance
    # for the comparison to be meaningful
    assert int(pq.n_elements) > 0
    assert np.isfinite(ref_logs['mae_rad'])
    np.testing.assert_allclose(jax_logs['panoptic_mae_deeplab_rad'],
                               ref_logs['mae_rad'], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(jax_logs['panoptic_mae_deeplab_deg'],
                               ref_logs['mae_deg'], rtol=1e-4,
                               atol=1e-3)
    for grp in ('all', 'things', 'stuff'):
        for m in ('pq', 'sq', 'rq'):
            np.testing.assert_allclose(
                jax_logs[f'panoptic_{grp}_deeplab_{m}'],
                ref_logs[f'{grp}_{m}'], rtol=1e-3, atol=1e-3,
                err_msg=f'{grp}_{m}')
