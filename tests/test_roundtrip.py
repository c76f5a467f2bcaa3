"""System-level GT round-trip (reference tests/test_metrics.py:494-647
and tests/test_merge.py): encode GT with the target generators, build
ideal network outputs from the encodings, run the full panoptic
postprocessing (NMS -> grouping -> on-device merge), and require
PQ = 1.0 (NMS kernel 1) / >= 0.99 (kernel 3) against the GT panoptic
targets. Also cross-checks the three merge implementations."""
import numpy as np
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.data._collate import mt_collate
from nicr_mtsa_tpu.data._types import AppliedPreprocessingMeta
from nicr_mtsa_tpu.data._types import PreprocessingParameterDict
from nicr_mtsa_tpu.data.preprocessing.base import APPLIED_PREPROCESSING_KEY
from nicr_mtsa_tpu.data.preprocessing.instance import InstanceTargetGenerator
from nicr_mtsa_tpu.data.preprocessing.panoptic import PanopticTargetGenerator
from nicr_mtsa_tpu.metrics import PanopticQuality
from nicr_mtsa_tpu.ops.merge import deeplab_merge
from nicr_mtsa_tpu.ops.merge_np import (
    deeplab_merge_semantic_and_instance_np,
    naive_merge_semantic_and_instance_np,
)
from nicr_mtsa_tpu.postprocessing import (
    InstancePostprocessing,
    PanopticPostprocessing,
    SemanticPostprocessing,
)


H, W = 120, 160
N_CLASSES_WITH_VOID = 9                      # 0 = void
THING_CLASS_IDS = (1, 2, 3)
IS_THING_WITH_VOID = tuple(
    i in THING_CLASS_IDS for i in range(N_CLASSES_WITH_VOID))
IS_THING_WITHOUT_VOID = IS_THING_WITH_VOID[1:]
SIGMA = 8
M = 1 << 16


def _make_gt_samples(batch_size=2, seed=0):
    """Non-overlapping rectangles with distinct centers (so the k=1
    round-trip is exact), plus stuff background and a void stripe."""
    rng = np.random.default_rng(seed)
    inst_gen = InstanceTargetGenerator(
        sigma=SIGMA, semantic_classes_is_thing=IS_THING_WITH_VOID,
        normalized_offset=True)
    pan_gen = PanopticTargetGenerator(
        semantic_classes_is_thing=IS_THING_WITH_VOID)

    samples = []
    for b in range(batch_size):
        semantic = np.full((H, W), 4, dtype='uint16')   # stuff class 4
        semantic[:, :10] = 0                            # void stripe
        semantic[-15:, :] = 5                           # 2nd stuff class
        instance = np.zeros((H, W), dtype='uint16')

        # grid of disjoint rectangles
        i = 1
        for gy in range(2):
            for gx in range(3):
                y0 = 8 + gy * 55 + int(rng.integers(0, 4))
                x0 = 14 + gx * 48 + int(rng.integers(0, 4))
                h = int(rng.integers(14, 30))
                w = int(rng.integers(14, 28))
                cls = int(rng.choice(THING_CLASS_IDS))
                semantic[y0:y0 + h, x0:x0 + w] = cls
                instance[y0:y0 + h, x0:x0 + w] = i
                i += 1

        sample = {
            'rgb': rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
            'semantic': semantic,
            'instance': instance,
            APPLIED_PREPROCESSING_KEY: AppliedPreprocessingMeta([
                PreprocessingParameterDict(
                    type='Resize',
                    valid_region_slice_y=slice(0, H),
                    valid_region_slice_x=slice(0, W)),
            ]),
        }
        # keep fullres twins so postprocessing can resize "back"
        sample['semantic_fullres'] = semantic.copy()
        sample['instance_fullres'] = instance.copy()
        sample = inst_gen(sample)
        sample = pan_gen(sample)
        samples.append(sample)
    return mt_collate(samples)


def _ideal_network_outputs(batch):
    """One-hot semantic logits + the GT center/offset encodings."""
    semantic = batch['semantic'].astype(np.int64)
    # a network cannot predict void; on void pixels an ideal network
    # predicts some stuff class (here: class 4) so no phantom thing
    # foreground appears there
    semantic_pred = np.where(semantic > 0, semantic, 4)
    logits = np.eye(N_CLASSES_WITH_VOID - 1,
                    dtype=np.float32)[semantic_pred - 1] * 20.0
    center = batch['instance_center'][..., None].astype(np.float32)
    offset = batch['instance_offset'].astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(center), jnp.asarray(offset)


def _run_roundtrip(kernel_size):
    batch = _make_gt_samples()
    logits, center, offset = _ideal_network_outputs(batch)

    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1,
            heatmap_nms_kernel_size=kernel_size,
            top_k_instances=64),
        semantic_classes_is_thing=IS_THING_WITHOUT_VOID,
        semantic_class_has_orientation=IS_THING_WITHOUT_VOID,
    )

    jbatch = {
        'instance_foreground': jnp.asarray(batch['instance_foreground']),
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
        'instance_fullres': batch['instance_fullres'],
        'semantic_fullres': batch['semantic_fullres'],
    }
    r_dict = post.postprocess(
        ((logits, (center, offset)), ((), ())), jbatch,
        is_training=False)

    pq = PanopticQuality(
        num_categories=N_CLASSES_WITH_VOID, ignored_label=0,
        max_instances_per_category=M, is_thing=IS_THING_WITH_VOID,
        gt_table_size=64, pred_table_size=128)
    pq.update(
        r_dict['panoptic_segmentation_deeplab'],
        jnp.asarray(batch['panoptic'].astype(np.int32)),
        gt_table=jnp.asarray(batch['panoptic_segment_table']),
    )
    return batch, r_dict, pq.compute()


def test_gt_roundtrip_exact_nms1():
    batch, r_dict, results = _run_roundtrip(kernel_size=1)
    assert results['all_pq'] == pytest.approx(1.0)
    assert results['all_sq'] == pytest.approx(1.0)
    assert results['all_rq'] == pytest.approx(1.0)
    assert results['things_pq'] == pytest.approx(1.0)
    assert results['stuff_pq'] == pytest.approx(1.0)

    # predicted instance count deviates < 2 per sample from GT
    for b in range(batch['instance'].shape[0]):
        n_gt = len(np.unique(batch['instance'][b])) - 1
        seg = np.asarray(
            r_dict['panoptic_segmentation_deeplab_instance_idx'][b])
        n_pred = len(np.unique(seg)) - 1
        assert abs(n_pred - n_gt) < 2


def test_gt_roundtrip_nms3():
    _, _, results = _run_roundtrip(kernel_size=3)
    assert results['all_pq'] >= 0.99
    assert results['all_sq'] >= 0.99
    assert results['all_rq'] >= 0.99


def test_identity_panoptic_pq_is_one():
    # PQ of the GT panoptic against itself must be exactly 1
    batch = _make_gt_samples(seed=5)
    pq = PanopticQuality(
        num_categories=N_CLASSES_WITH_VOID, ignored_label=0,
        max_instances_per_category=M, is_thing=IS_THING_WITH_VOID,
        gt_table_size=64, pred_table_size=64)
    pan = jnp.asarray(batch['panoptic'].astype(np.int32))
    pq.update(pan, pan, gt_table=jnp.asarray(batch['panoptic_segment_table']))
    results = pq.compute()
    assert results['all_pq'] == pytest.approx(1.0)
    assert results['things_pq'] == pytest.approx(1.0)
    assert results['stuff_pq'] == pytest.approx(1.0)


def test_merge_implementations_agree_on_gt():
    """naive-np == deeplab-np == device merge on GT that does not cross
    class borders (reference tests/test_merge.py:26-102)."""
    batch = _make_gt_samples(seed=7)
    sem = batch['semantic'].astype(np.uint16)
    ins = batch['instance'].astype(np.uint16)

    for b in range(sem.shape[0]):
        fg = np.isin(sem[b], THING_CLASS_IDS).astype(np.uint8)
        naive, naive_ids = naive_merge_semantic_and_instance_np(
            sem[b], ins[b], M, THING_CLASS_IDS, 0)
        dl, dl_ids = deeplab_merge_semantic_and_instance_np(
            sem[b], ins[b], fg, M, THING_CLASS_IDS, 0)
        np.testing.assert_array_equal(naive, dl)
        assert naive_ids == dl_ids
        np.testing.assert_array_equal(naive, batch['panoptic'][b])

    thing_table = np.array(IS_THING_WITH_VOID)
    K = int(ins.max())
    device = deeplab_merge(
        jnp.asarray(sem.astype(np.int32)),
        jnp.asarray(ins.astype(np.int32)),
        jnp.asarray(np.isin(sem, THING_CLASS_IDS)),
        jnp.asarray(thing_table),
        max_instances_per_category=M, top_k=K,
        n_classes_with_void=N_CLASSES_WITH_VOID)
    np.testing.assert_array_equal(
        np.asarray(device.panoptic), batch['panoptic'].astype(np.int64))


def test_gt_roundtrip_zero_instances():
    """All-stuff scene: the fixed-shape path (K=64 padded center
    tables, segment tables) must flow through NMS -> grouping ->
    merge -> PQ with ZERO valid instances and still score PQ = 1.0
    on the stuff classes."""
    inst_gen = InstanceTargetGenerator(
        sigma=SIGMA, semantic_classes_is_thing=IS_THING_WITH_VOID,
        normalized_offset=True)
    pan_gen = PanopticTargetGenerator(
        semantic_classes_is_thing=IS_THING_WITH_VOID)

    samples = []
    for b in range(2):
        semantic = np.full((H, W), 4, dtype='uint16')
        semantic[-20:, :] = 5
        semantic[:, :8] = 0                      # void stripe
        instance = np.zeros((H, W), dtype='uint16')
        sample = {
            'semantic': semantic, 'instance': instance,
            'semantic_fullres': semantic.copy(),
            'instance_fullres': instance.copy(),
            APPLIED_PREPROCESSING_KEY: AppliedPreprocessingMeta([
                PreprocessingParameterDict(
                    type='Resize',
                    valid_region_slice_y=slice(0, H),
                    valid_region_slice_x=slice(0, W)),
            ]),
        }
        samples.append(pan_gen(inst_gen(sample)))
    batch = mt_collate(samples)

    logits, center, offset = _ideal_network_outputs(batch)
    assert float(batch['instance_center'].max()) == 0.0

    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=64),
        semantic_classes_is_thing=IS_THING_WITHOUT_VOID,
        semantic_class_has_orientation=IS_THING_WITHOUT_VOID,
    )
    jbatch = {
        'instance_foreground': jnp.asarray(batch['instance_foreground']),
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
        'instance_fullres': batch['instance_fullres'],
        'semantic_fullres': batch['semantic_fullres'],
    }
    r_dict = post.postprocess(
        ((logits, (center, offset)), ((), ())), jbatch,
        is_training=False)

    inst_map = np.asarray(
        r_dict['panoptic_segmentation_deeplab_instance_idx'])
    assert (inst_map == 0).all()        # no thing segments anywhere

    pq = PanopticQuality(
        num_categories=N_CLASSES_WITH_VOID, ignored_label=0,
        max_instances_per_category=M, is_thing=IS_THING_WITH_VOID,
        gt_table_size=64, pred_table_size=128)
    pq.update(
        r_dict['panoptic_segmentation_deeplab'],
        jnp.asarray(batch['panoptic'].astype(np.int32)),
        gt_table=jnp.asarray(batch['panoptic_segment_table']))
    results = pq.compute()
    assert results['all_pq'] == pytest.approx(1.0)
    assert results['stuff_pq'] == pytest.approx(1.0)
    assert np.isnan(results['things_pq']) or results['things_pq'] == 0.0
