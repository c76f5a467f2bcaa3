"""Metric tests: the reference's hand-computed TF-models PQ cases
(tests/test_metrics.py:76-447), mIoU vs a manual confusion matrix, and
the angular-error metric."""
import numpy as np
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.metrics import (
    MeanAbsoluteAngularError,
    MeanIntersectionOverUnion,
    PanopticQuality,
    RootMeanSquaredError,
    abs_angle_error_rad,
    add_states,
)


def _pq(num_categories, ignored_label, M, is_thing):
    return PanopticQuality(
        num_categories=num_categories, ignored_label=ignored_label,
        max_instances_per_category=M, offset=256 ** 3,
        is_thing=is_thing, gt_table_size=16, pred_table_size=16)


def test_pq_perfect_match():
    category = np.zeros((1, 6, 6), np.int64)
    instance = np.array([[
        [1, 1, 1, 1, 1, 1],
        [1, 2, 2, 2, 2, 1],
        [1, 2, 2, 2, 2, 1],
        [1, 2, 2, 2, 2, 1],
        [1, 2, 2, 1, 1, 1],
        [1, 2, 1, 1, 1, 1],
    ]], np.int64)

    pq = _pq(1, 2, 16, [True])
    ids = jnp.asarray(category * 16 + instance, jnp.int32)
    pq.update(ids, ids)

    np.testing.assert_allclose(np.asarray(pq.state['iou_per_class']), [2.0])
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']), [2])
    np.testing.assert_array_equal(np.asarray(pq.state['fn_per_class']), [0])
    np.testing.assert_array_equal(np.asarray(pq.state['fp_per_class']), [0])
    results = pq.compute()
    np.testing.assert_array_equal(results['pq_per_class'], [1.0])
    assert results['all_pq'] == 1.0
    assert results['all_rq'] == 1.0
    assert results['all_sq'] == 1.0
    assert results['all_num_categories'] == 1


def test_pq_totally_wrong():
    category = np.array([[
        [0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 1, 0],
        [0, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0],
    ]], np.int64)

    gt = jnp.asarray(category, jnp.int32)
    pred = jnp.asarray(1 - category, jnp.int32)

    pq = _pq(2, 2, 1, [True, True])
    pq.update(pred, gt)

    np.testing.assert_array_equal(np.asarray(pq.state['iou_per_class']),
                                  [0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']),
                                  [0, 0])
    np.testing.assert_array_equal(np.asarray(pq.state['fn_per_class']),
                                  [1, 1])
    np.testing.assert_array_equal(np.asarray(pq.state['fp_per_class']),
                                  [1, 1])
    results = pq.compute()
    assert results['all_pq'] == 0.0
    assert results['all_num_categories'] == 2


GT_INSTANCES = np.array([[
    [1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1],
    [1, 1, 2, 2, 2, 1],
    [1, 2, 2, 2, 2, 1],
    [1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1],
]], np.int64)

GOOD_DET = np.array([[
    [1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1],
    [1, 2, 2, 2, 2, 1],
    [1, 2, 2, 2, 1, 1],
    [1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1],
]], np.int64)

BAD_DET = np.array([[
    [1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1],
    [1, 1, 1, 2, 2, 1],
    [1, 1, 1, 2, 2, 1],
    [1, 1, 1, 2, 2, 1],
    [1, 1, 1, 1, 1, 1],
]], np.int64)


def test_pq_matches_by_iou():
    pq = _pq(1, 2, 16, [True])
    gt = jnp.asarray(GT_INSTANCES, jnp.int32)

    pq.update(jnp.asarray(GOOD_DET, jnp.int32), gt)
    np.testing.assert_allclose(np.asarray(pq.state['iou_per_class']),
                               [28 / 30 + 6 / 8], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']), [2])
    results = pq.compute()
    np.testing.assert_allclose(results['all_pq'], (28 / 30 + 6 / 8) / 2,
                               rtol=1e-6)
    assert results['all_rq'] == 1.0

    pq.reset()
    pq.update(jnp.asarray(BAD_DET, jnp.int32), gt)
    # iou(1,1) = 27/32; instance 2 mismatch -> fn + fp
    np.testing.assert_allclose(np.asarray(pq.state['iou_per_class']),
                               [27 / 32], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']), [1])
    np.testing.assert_array_equal(np.asarray(pq.state['fn_per_class']), [1])
    np.testing.assert_array_equal(np.asarray(pq.state['fp_per_class']), [1])
    results = pq.compute()
    np.testing.assert_allclose(results['all_pq'], 27 / 32 / 2, rtol=1e-6)
    assert results['all_rq'] == 0.5


def test_pq_wrong_instances():
    category = np.array([[
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1],
        [1, 2, 2, 1, 2, 2],
        [1, 2, 2, 1, 2, 2],
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1],
    ]], np.int64)
    pred_instance = np.zeros((1, 6, 6), np.int64)
    pred_instance[0, 2:4, 4:6] = 1

    gt = jnp.asarray(category * 10, jnp.int32)
    pred = jnp.asarray(category * 10 + pred_instance, jnp.int32)

    pq = _pq(3, 0, 10, [True, True, True])
    pq.update(pred, gt)

    np.testing.assert_array_equal(np.asarray(pq.state['iou_per_class']),
                                  [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']),
                                  [0, 1, 0])
    np.testing.assert_array_equal(np.asarray(pq.state['fn_per_class']),
                                  [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(pq.state['fp_per_class']),
                                  [0, 0, 2])
    results = pq.compute()
    assert results['all_pq'] == 0.5
    assert results['all_num_categories'] == 2


def test_pq_instance_order_is_arbitrary():
    category = np.array([[
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1],
        [1, 2, 2, 1, 2, 2],
        [1, 2, 2, 1, 2, 2],
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1],
    ]], np.int64)
    gt_instance = np.zeros((1, 6, 6), np.int64)
    gt_instance[0, 2:4, 1:3] = 1
    pred_instance = np.zeros((1, 6, 6), np.int64)
    pred_instance[0, 2:4, 4:6] = 1

    gt = jnp.asarray(category * 10 + gt_instance, jnp.int32)
    pred = jnp.asarray(category * 10 + pred_instance, jnp.int32)

    pq = _pq(3, 0, 10, [True, True, True])
    pq.update(pred, gt)

    np.testing.assert_array_equal(np.asarray(pq.state['iou_per_class']),
                                  [0.0, 1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']),
                                  [0, 1, 2])
    results = pq.compute()
    assert results['all_pq'] == 1.0


def test_pq_multiple_batches():
    pq = _pq(1, 2, 16, [True])
    # batch of 2 identical images (note arg order follows the
    # reference test: first update passes gt as preds)
    gt = jnp.asarray(np.concatenate([GT_INSTANCES] * 2), jnp.int32)
    good = jnp.asarray(np.concatenate([GOOD_DET] * 2), jnp.int32)
    bad = jnp.asarray(np.concatenate([BAD_DET] * 2), jnp.int32)

    pq.update(gt, good)
    pq.update(gt, bad)

    results = pq.compute()
    np.testing.assert_allclose(
        results['pq_per_class'], [((28 / 30 + 6 / 8) + 27 / 32) / 2 / 2],
        rtol=1e-6)
    np.testing.assert_allclose(results['rq_per_class'], [3 / 4])
    np.testing.assert_allclose(results['all_pq'], 0.63177083, atol=1e-6)
    assert results['all_rq'] == 0.75
    np.testing.assert_allclose(results['all_sq'], 0.84236111, atol=1e-6)


def test_pq_with_precomputed_gt_table():
    # feeding the host-precomputed segment table must give the same
    # result as the on-device unique
    from nicr_mtsa_tpu.ops.segments import SEGMENT_TABLE_PAD
    pq = _pq(1, 2, 16, [True])
    gt = jnp.asarray(GT_INSTANCES, jnp.int32)
    pred = jnp.asarray(GOOD_DET, jnp.int32)

    table = np.full((1, 16), SEGMENT_TABLE_PAD, np.int32)
    ids = np.unique(GT_INSTANCES)
    table[0, :len(ids)] = ids

    s_auto = pq.update_state(pq.empty_state(), pred, gt)
    s_table = pq.update_state(pq.empty_state(), pred, gt,
                              gt_table=jnp.asarray(table))
    for k in s_auto:
        np.testing.assert_allclose(np.asarray(s_auto[k]),
                                   np.asarray(s_table[k]))


def test_miou_against_manual_confusion():
    rng = np.random.default_rng(0)
    n_classes = 7
    gt = rng.integers(0, n_classes, (4, 50, 60))
    pred = rng.integers(0, n_classes, (4, 50, 60))

    miou = MeanIntersectionOverUnion(n_classes=n_classes)
    miou.update(jnp.asarray(pred), jnp.asarray(gt))

    cm = np.zeros((n_classes, n_classes), np.int64)
    for t, p in zip(gt.ravel(), pred.ravel()):
        cm[t, p] += 1
    np.testing.assert_array_equal(np.asarray(miou.state), cm)

    ious = [cm[c, c] / (cm[c].sum() + cm[:, c].sum() - cm[c, c])
            for c in range(n_classes)]
    assert miou.compute() == pytest.approx(np.mean(ious), rel=1e-5)

    # state merge (the distributed reduction semantics)
    miou2 = MeanIntersectionOverUnion(n_classes=n_classes)
    miou2.update(jnp.asarray(pred), jnp.asarray(gt))
    merged = add_states(miou.state, miou2.state)
    np.testing.assert_array_equal(np.asarray(merged), 2 * cm)


def test_miou_ignore_first_class():
    gt = np.array([[0, 1, 1, 2, 2, 2]])
    pred = np.array([[1, 1, 1, 2, 2, 1]])
    miou = MeanIntersectionOverUnion(n_classes=3, ignore_first_class=True)
    miou.update(jnp.asarray(pred), jnp.asarray(gt))
    # class1: tp=2, pred_sum=4-1(void gt)=3, gt_sum=2 -> iou=2/3
    # class2: tp=2, pred_sum=2, gt_sum=3 -> iou=2/3
    assert miou.compute() == pytest.approx(2 / 3, rel=1e-6)


def test_rmse_masked():
    pred = np.zeros((1, 4, 4, 3), np.float32)
    target = np.ones((1, 4, 4, 3), np.float32) * 2
    mask = np.zeros((1, 4, 4), bool)
    mask[0, :2] = True
    rmse = RootMeanSquaredError()
    rmse.update(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    assert rmse.compute() == pytest.approx(2.0)


def test_abs_angle_error_wraps():
    assert float(abs_angle_error_rad(0.1, 2 * np.pi - 0.1)) == \
        pytest.approx(0.2, abs=1e-6)
    assert float(abs_angle_error_rad(-np.pi, np.pi)) == pytest.approx(0.0)


def test_mae_metric():
    mae = MeanAbsoluteAngularError()
    pred = jnp.asarray([0.0, 1.0, 2.0])
    tgt = jnp.asarray([0.5, 1.0, 1.5])
    mae.update(pred, tgt, valid=jnp.asarray([True, True, False]))
    rad, deg = mae.compute()
    assert rad == pytest.approx(0.25, abs=1e-6)
    assert deg == pytest.approx(np.rad2deg(0.25), abs=1e-4)


def _naive_pq_counts(target, pred, C, ignored, M):
    """Independent dict-based PQ counting (TF-models semantics,
    reference metric/pq.py:30-361): per-pair IoU with void-union
    correction, IoU>0.5 matching, mostly-void FP forgiveness."""
    tp = np.zeros(C); fn = np.zeros(C); fp = np.zeros(C)
    iou_sum = np.zeros(C)
    void_seg = ignored * M
    for b in range(target.shape[0]):
        t = target[b].ravel(); p = pred[b].ravel()
        gt_area, pred_area, inter = {}, {}, {}
        for g, q in zip(t, p):
            gt_area[g] = gt_area.get(g, 0) + 1
            pred_area[q] = pred_area.get(q, 0) + 1
            inter[(g, q)] = inter.get((g, q), 0) + 1
        # overlap of each pred seg with THE void segment id
        r = {q: inter.get((void_seg, q), 0) for q in pred_area}
        # overlap with ALL ignored-category gt segments
        pio = {q: sum(v for (g, q2), v in inter.items()
                      if q2 == q and g // M == ignored)
               for q in pred_area}
        gt_matched, pred_matched = set(), set()
        for (g, q), n in inter.items():
            if g // M != q // M:
                continue
            if g == 0 and q == void_seg:
                continue
            union = gt_area[g] + pred_area[q] - n - r[q]
            if union <= 0:
                continue
            if n / union > 0.5:
                cat = min(g // M, C - 1)
                tp[cat] += 1
                iou_sum[cat] += n / union
                gt_matched.add(g); pred_matched.add(q)
        for g, a in gt_area.items():
            if g in gt_matched or g // M == ignored or a == 0:
                continue
            fn[min(g // M, C - 1)] += 1
        for q, a in pred_area.items():
            if q in pred_matched or a == 0:
                continue
            if pio[q] > 0.5 * a:
                continue
            fp[min(q // M, C - 1)] += 1
    return tp, fn, fp, iou_sum


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_pq_randomized_vs_naive(seed):
    C, ignored, M = 4, 3, 8
    rng = np.random.default_rng(seed)
    B, H, W = 2, 24, 24

    def random_panoptic():
        # blocky maps: few segments, realistic overlaps
        base = rng.integers(0, C * M, (B, 3, 3)).astype(np.int32)
        return np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)

    target = random_panoptic()
    pred = random_panoptic()

    pq = _pq(C, ignored, M, [True, True, False, False])
    pq.update(jnp.asarray(pred), jnp.asarray(target))

    tp, fn, fp, iou_sum = _naive_pq_counts(target, pred, C, ignored, M)
    np.testing.assert_array_equal(np.asarray(pq.state['tp_per_class']), tp)
    np.testing.assert_array_equal(np.asarray(pq.state['fn_per_class']), fn)
    np.testing.assert_array_equal(np.asarray(pq.state['fp_per_class']), fp)
    np.testing.assert_allclose(np.asarray(pq.state['iou_per_class']),
                               iou_sum, rtol=1e-5)
