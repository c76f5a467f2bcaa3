"""Unit tests for the jittable postprocessing kernels against numpy /
reference-semantics golden implementations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.ops.grouping import (
    denormalize_offsets,
    get_instance_segmentation,
    group_pixels,
    instance_orientations,
)
from nicr_mtsa_tpu.ops.merge import deeplab_merge
from nicr_mtsa_tpu.ops.merge_np import deeplab_merge_semantic_and_instance_np
from nicr_mtsa_tpu.ops.nms import get_instance_centers, nms_keep_mask
from nicr_mtsa_tpu.ops.pallas.layernorm import fused_layer_norm
from nicr_mtsa_tpu.ops.segments import (
    SEGMENT_TABLE_PAD,
    ids_to_slots,
    intersection_matrix,
    unique_table,
)


def test_nms_finds_isolated_peaks():
    hm = np.zeros((1, 32, 32), np.float32)
    hm[0, 10, 10] = 0.9
    hm[0, 20, 25] = 0.8
    hm[0, 5, 5] = 0.05          # below threshold
    centers = get_instance_centers(jnp.asarray(hm), threshold=0.1,
                                   kernel_size=3, top_k=8)
    valid = np.asarray(centers.valid[0])
    yx = np.asarray(centers.yx[0])
    assert valid.sum() == 2
    assert {tuple(p) for p in yx[valid]} == {(10, 10), (20, 25)}
    # scores sorted descending
    assert centers.score[0, 0] == pytest.approx(0.9)
    assert centers.score[0, 1] == pytest.approx(0.8)


def test_nms_tie_breaking_first_index_wins():
    hm = np.zeros((1, 16, 16), np.float32)
    # two adjacent equal maxima inside one 3x3 window: the first in
    # row-major scan order survives
    hm[0, 8, 8] = 0.5
    hm[0, 8, 9] = 0.5
    keep = np.asarray(nms_keep_mask(jnp.asarray(hm), 0.1, 3))
    assert keep[0, 8, 8]
    assert not keep[0, 8, 9]

    # vertical tie
    hm2 = np.zeros((1, 16, 16), np.float32)
    hm2[0, 4, 3] = 0.7
    hm2[0, 5, 3] = 0.7
    keep2 = np.asarray(nms_keep_mask(jnp.asarray(hm2), 0.1, 3))
    assert keep2[0, 4, 3] and not keep2[0, 5, 3]


def test_nms_border_excluded():
    hm = np.zeros((1, 16, 16), np.float32)
    hm[0, 0, 5] = 0.9    # on the border -> excluded for k=3
    keep = np.asarray(nms_keep_mask(jnp.asarray(hm), 0.1, 3))
    assert not keep.any()


def test_grouping_recovers_rectangles():
    # two rectangles with exact offsets to their centers
    H, W = 40, 60
    seg_gt = np.zeros((1, H, W), np.int32)
    offset = np.zeros((1, H, W, 2), np.float32)
    hm = np.zeros((1, H, W), np.float32)
    rects = [((5, 5), (15, 20)), ((25, 30), (35, 50))]
    centers = []
    for i, ((y0, x0), (y1, x1)) in enumerate(rects, start=1):
        cy, cx = (y0 + y1 - 1) // 2, (x0 + x1 - 1) // 2
        centers.append((cy, cx))
        seg_gt[0, y0:y1, x0:x1] = i
        yy, xx = np.meshgrid(np.arange(y0, y1), np.arange(x0, x1),
                             indexing='ij')
        offset[0, y0:y1, x0:x1, 0] = cy - yy
        offset[0, y0:y1, x0:x1, 1] = cx - xx
        hm[0, cy, cx] = 1.0
    fg = seg_gt > 0

    result = get_instance_segmentation(
        jnp.asarray(hm), jnp.asarray(offset), jnp.asarray(fg),
        threshold=0.1, kernel_size=3, top_k=8)
    seg = np.asarray(result.segmentation[0])

    # ids may be permuted (sorted by score/top-k order); compare as sets
    assert (seg > 0).sum() == (seg_gt > 0).sum()
    for i, (cy, cx) in enumerate(centers, start=1):
        pred_id = seg[cy, cx]
        assert pred_id > 0
        np.testing.assert_array_equal(seg == pred_id, seg_gt[0] == i)

    # areas consistent
    areas = np.asarray(result.areas[0])
    for i, ((y0, x0), (y1, x1)) in enumerate(rects, start=1):
        cy, cx = centers[i - 1]
        pred_id = seg[cy, cx]
        assert areas[pred_id] == (y1 - y0) * (x1 - x0)


class TestBlockReducedTopK:
    """The 2x2-block-reduced center extraction must reproduce the
    plain full-map `lax.top_k` exactly, including tie order."""

    def _full_top_k_centers(self, hm, threshold, kernel_size, top_k):
        import jax.numpy as _jnp
        from nicr_mtsa_tpu.ops.nms import nms_keep_mask
        keep = nms_keep_mask(_jnp.asarray(hm), threshold, kernel_size)
        scores_map = _jnp.where(keep, _jnp.asarray(hm), -1.0)
        B, H, W = hm.shape
        return jax.lax.top_k(scores_map.reshape(B, H * W), top_k)

    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_random_maps_match_full_top_k(self, seed):
        rng = np.random.default_rng(seed)
        hm = rng.random((3, 64, 96)).astype(np.float32)
        got = get_instance_centers(jnp.asarray(hm), threshold=0.1,
                                   kernel_size=3, top_k=16)
        s_ref, i_ref = self._full_top_k_centers(hm, 0.1, 3, 16)
        flat_got = got.yx[..., 0] * 96 + got.yx[..., 1]
        np.testing.assert_array_equal(np.asarray(flat_got),
                                      np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(got.score),
                                      np.asarray(s_ref))

    def test_tie_order_matches_full_top_k(self):
        # many EQUAL-score peaks spread across block rows: order must
        # still be by lowest flat index, as lax.top_k ties
        hm = np.zeros((1, 32, 48), np.float32)
        peaks = [(3, 5), (3, 40), (7, 2), (10, 21), (15, 15), (15, 44),
                 (21, 8), (25, 33), (28, 4), (29, 45)]
        for y, x in peaks:
            hm[0, y, x] = 0.5
        hm[0, 18, 30] = 0.75      # one higher peak ranks first
        got = get_instance_centers(jnp.asarray(hm), threshold=0.1,
                                   kernel_size=3, top_k=8)
        s_ref, i_ref = self._full_top_k_centers(hm, 0.1, 3, 8)
        flat_got = got.yx[..., 0] * 48 + got.yx[..., 1]
        np.testing.assert_array_equal(np.asarray(flat_got),
                                      np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(got.score),
                                      np.asarray(s_ref))


def test_grouping_distance_threshold():
    H, W = 20, 20
    hm = np.zeros((1, H, W), np.float32)
    hm[0, 10, 10] = 1.0
    offset = np.zeros((1, H, W, 2), np.float32)
    fg = np.ones((1, H, W), bool)
    seg = group_pixels(
        jnp.asarray([[[10, 10]]], dtype=jnp.int32),
        jnp.asarray([[True]]),
        jnp.asarray(offset), jnp.asarray(fg),
        offset_distance_threshold=3)
    seg = np.asarray(seg[0])
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
    dist = np.sqrt((yy - 10.0) ** 2 + (xx - 10.0) ** 2)
    np.testing.assert_array_equal(seg > 0, dist <= 3)


def test_denormalize_offsets():
    off = np.full((1, 4, 8, 2), 0.5, np.float32)
    out = np.asarray(denormalize_offsets(jnp.asarray(off), 4, 8))
    assert (out[..., 0] == 2.0).all()
    assert (out[..., 1] == 4.0).all()


def test_instance_orientations():
    seg = np.zeros((1, 10, 10), np.int32)
    seg[0, :5] = 1
    seg[0, 5:] = 2
    ori = np.zeros((1, 10, 10, 2), np.float32)
    ori[0, :5] = [np.cos(0.5), np.sin(0.5)]
    ori[0, 5:] = [np.cos(2.5), np.sin(2.5)]
    angles = np.asarray(instance_orientations(
        jnp.asarray(ori), jnp.asarray(seg), None, top_k=4))
    assert angles[0, 1] == pytest.approx(0.5, abs=1e-5)
    assert angles[0, 2] == pytest.approx(2.5, abs=1e-5)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_deeplab_merge_matches_numpy_reference(seed):
    rng = np.random.default_rng(seed)
    H, W, K, C = 30, 40, 8, 9
    thing_ids = (1, 2, 3)
    sem = rng.integers(0, C, (2, H, W)).astype(np.uint8)
    ins = rng.integers(0, K + 1, (2, H, W)).astype(np.uint16)
    fg = rng.random((2, H, W)) > 0.3

    thing_table = np.array([c in thing_ids for c in range(C)])
    M = 1 << 16

    result = deeplab_merge(
        jnp.asarray(sem.astype(np.int32)),
        jnp.asarray(ins.astype(np.int32)),
        jnp.asarray(fg),
        jnp.asarray(thing_table),
        max_instances_per_category=M,
        top_k=K, n_classes_with_void=C)

    for b in range(2):
        expected, id_dict = deeplab_merge_semantic_and_instance_np(
            sem[b], ins[b], fg[b].astype(np.uint8), M, thing_ids, 0)
        np.testing.assert_array_equal(
            np.asarray(result.panoptic[b]), expected.astype(np.int64))
        # id table matches the reference id dict (pan id -> raw ins id)
        table = np.asarray(result.panoptic_id_table[b])
        got = {int(table[i]): i for i in range(1, K + 1) if table[i] != 0}
        assert got == id_dict


def test_unique_table_and_slots():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 50, (2, 200)).astype(np.int32) * 1000
    table = np.asarray(unique_table(jnp.asarray(ids), size=64))
    for b in range(2):
        expected = np.unique(ids[b])
        valid = table[b][table[b] != SEGMENT_TABLE_PAD]
        np.testing.assert_array_equal(valid, expected)

    slots = np.asarray(ids_to_slots(jnp.asarray(ids), jnp.asarray(table)))
    for b in range(2):
        for p in range(ids.shape[1]):
            assert table[b][slots[b, p]] == ids[b, p]


def test_ids_to_slots_bucketed_matches_flat():
    # the two-level (bucketed) compare-count must be EXACTLY the flat
    # searchsorted-left semantics: present ids -> match index, missing
    # ids (incl. bucket-boundary neighbors and beyond-table values)
    # -> S. Covers both bucketed table sizes used by PQ (256 gt, 128
    # pred) and the small-table flat path.
    rng = np.random.default_rng(11)
    for S in (16, 128, 256):
        # odd ids > 2^16 (panoptic class*65536 + instance): NOT bf16-
        # representable, so any reduced-precision pass through the
        # bucket-fetch selection matmul corrupts them and this test
        # catches it (the exact failure the full-system parity test
        # first surfaced: 131073 -> bf16 -> 131072, membership lost)
        vals = np.sort(rng.choice(3_000_000, size=max(8, S - 40),
                                  replace=False)) * 2 + 65537
        table = np.full((2, S), SEGMENT_TABLE_PAD, np.int32)
        table[0, :len(vals)] = vals
        table[1, :len(vals)] = np.sort(
            rng.choice(3_000_000, size=len(vals), replace=False))
        # mix of present ids, near-miss ids, and extremes
        present = table[:, :len(vals)]
        picks = present[:, rng.integers(0, len(vals), 300)]
        near = picks + rng.choice([-1, 1], size=picks.shape)
        ids = np.concatenate(
            [picks, near,
             np.zeros((2, 4), np.int32),
             np.full((2, 4), 2 ** 24 - 1, np.int32)], axis=1)
        got = np.asarray(ids_to_slots(jnp.asarray(ids),
                                      jnp.asarray(table)))
        for b in range(2):
            expect = np.searchsorted(table[b], ids[b], side='left')
            member = np.isin(ids[b], table[b])
            expect = np.where(member, expect, S)
            np.testing.assert_array_equal(got[b], expect)


def test_intersection_matrix():
    rng = np.random.default_rng(4)
    gt = rng.integers(0, 5, (1, 300))
    pred = rng.integers(0, 7, (1, 300))
    m = np.asarray(intersection_matrix(jnp.asarray(gt), jnp.asarray(pred),
                                       n_gt=5, n_pred=7))
    brute = np.zeros((6, 8))
    for g, p in zip(gt[0], pred[0]):
        brute[g, p] += 1
    np.testing.assert_array_equal(m[0], brute)


class TestPallasKernelsInterpret:
    """Interpret-mode parity of the Pallas TPU kernels against the XLA
    fallback formulations (on-TPU agreement was additionally verified
    on real hardware, see PERF.md)."""

    def test_semantic_score_idx_matches_xla(self):
        from nicr_mtsa_tpu.ops.pallas.semantic_reduce import (
            semantic_score_idx, semantic_score_idx_pallas,
        )
        rng = np.random.default_rng(0)
        logits = jnp.asarray(
            rng.normal(size=(2, 16, 128, 11)).astype(np.float32) * 4.0,
            jnp.bfloat16)

        score_p, idx_p = semantic_score_idx_pallas(
            logits, block_h=8, interpret=True)
        score_x, idx_x = semantic_score_idx(logits, backend='xla')

        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
        np.testing.assert_allclose(np.asarray(score_p),
                                   np.asarray(score_x), rtol=1e-5)

    def test_semantic_score_idx_tie_break_first(self):
        from nicr_mtsa_tpu.ops.pallas.semantic_reduce import (
            semantic_score_idx_pallas,
        )
        logits = np.zeros((1, 8, 128, 5), np.float32)
        logits[..., 2] = 1.0
        logits[..., 4] = 1.0        # tie with class 2 -> first wins
        _, idx = semantic_score_idx_pallas(jnp.asarray(logits),
                                           block_h=8, interpret=True)
        assert (np.asarray(idx) == 2).all()

    def test_group_pixels_pallas_matches_xla(self):
        from nicr_mtsa_tpu.ops.grouping import group_pixels
        from nicr_mtsa_tpu.ops.pallas.grouping_kernel import (
            group_pixels_pallas,
        )
        rng = np.random.default_rng(1)
        B, H, W, K = 2, 16, 128, 7
        centers_yx = rng.integers(0, (H, W), (B, K, 2)).astype(np.int32)
        centers_valid = rng.random((B, K)) > 0.3
        offset = rng.normal(size=(B, H, W, 2)).astype(np.float32) * 3
        fg = rng.random((B, H, W)) > 0.4

        ids_x = group_pixels(jnp.asarray(centers_yx),
                             jnp.asarray(centers_valid),
                             jnp.asarray(offset), jnp.asarray(fg),
                             backend='xla')

        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        loc_y = (yy[None] + offset[..., 0]).reshape(B, H * W)
        loc_x = (xx[None] + offset[..., 1]).reshape(B, H * W)
        ids_p, _ = group_pixels_pallas(
            jnp.asarray(loc_y), jnp.asarray(loc_x),
            jnp.asarray(centers_yx, jnp.float32),
            jnp.asarray(centers_valid),
            jnp.asarray(fg.reshape(B, H * W)), interpret=True)

        np.testing.assert_array_equal(
            np.asarray(ids_p).reshape(B, H, W), np.asarray(ids_x))

    def test_group_pixels_pallas_no_valid_centers(self):
        from nicr_mtsa_tpu.ops.pallas.grouping_kernel import (
            group_pixels_pallas,
        )
        B, P, K = 1, 8192, 4
        ids, _ = group_pixels_pallas(
            jnp.zeros((B, P)), jnp.zeros((B, P)),
            jnp.zeros((B, K, 2)), jnp.zeros((B, K), bool),
            jnp.ones((B, P), bool), interpret=True)
        assert (np.asarray(ids) == 0).all()

    def test_intersection_matrix_pallas_matches_xla(self):
        from nicr_mtsa_tpu.ops.pallas.intersection_kernel import (
            intersection_matrix_pallas,
        )
        from nicr_mtsa_tpu.ops.segments import intersection_matrix
        rng = np.random.default_rng(5)
        B, P = 2, 4096
        gt = jnp.asarray(rng.integers(0, 6, (B, P)).astype(np.int32))
        pred = jnp.asarray(rng.integers(0, 9, (B, P)).astype(np.int32))
        m_k = intersection_matrix_pallas(
            gt, pred, n_gt=5, n_pred=8, block_p=1024, interpret=True)
        m_x = intersection_matrix(gt, pred, n_gt=5, n_pred=8)
        np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_x))
        # on real TPU hardware the kernel matched the einsum exactly at
        # (8, 262144) x (66, 130) -- see PERF.md

    def test_semantic_finisher_matches_numpy_oracle_f32(self):
        # f32 end-to-end against an exact float64 numpy oracle of
        # nearest-x2 + zero-padded depthwise 3x3 + argmax/score. The
        # XLA conv path is NOT the oracle here: on CPU it routes
        # through oneDNN with ~1e-3 reduced-precision error (on real
        # TPU hardware the kernel matched this f64 oracle with
        # 0/262144 idx mismatches at C in {16, 40}, see PERF.md).
        # C=40 (the serving shape): pallas-interpret mispads the class
        # axis for small C (scores stay exact, argmax picks the pad) --
        # the real-TPU path is gated to C % 8 == 0 anyway.
        from nicr_mtsa_tpu.ops.pallas.semantic_finisher import (
            upsample2x_argmax_score,
        )
        rng = np.random.default_rng(3)
        B, H, W, C = 8, 8, 16, 40
        x = rng.normal(size=(B, H, W, C)).astype(np.float32)
        kern = rng.normal(0, 0.1, size=(3, 3, 1, C)).astype(np.float32)
        bias = rng.normal(0, 0.05, size=(C,)).astype(np.float32)

        up = np.repeat(np.repeat(x.astype(np.float64), 2, 1), 2, 2)
        upp = np.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)))
        logits = np.zeros_like(up)
        for dy in range(3):
            for dx in range(3):
                logits += (kern[dy, dx, 0].astype(np.float64)
                           * upp[:, dy:dy + 2 * H, dx:dx + 2 * W, :])
        logits += bias
        idx_o = np.argmax(logits, axis=-1)
        m = logits.max(axis=-1, keepdims=True)
        score_o = 1.0 / np.sum(np.exp(logits - m), axis=-1)

        idx, score = upsample2x_argmax_score(
            jnp.asarray(x), jnp.asarray(kern), jnp.asarray(bias),
            block_h=4, block_w=8, interpret=True)
        assert idx.shape == (B, 2 * H, 2 * W)
        np.testing.assert_array_equal(np.asarray(idx), idx_o)
        np.testing.assert_allclose(np.asarray(score), score_o, rtol=1e-4)

    def test_semantic_finisher_tie_break_first(self):
        from nicr_mtsa_tpu.ops.pallas.semantic_finisher import (
            upsample2x_argmax_score,
        )
        B, H, W, C = 8, 8, 16, 5
        x = np.zeros((B, H, W, C), np.float32)
        x[..., 1] = 2.0
        x[..., 3] = 2.0          # tie with class 1 -> first wins
        # identity-ish kernel (center tap only) keeps the tie at 2x res
        kern = np.zeros((3, 3, 1, C), np.float32)
        kern[1, 1] = 1.0
        idx, _ = upsample2x_argmax_score(
            jnp.asarray(x), jnp.asarray(kern), jnp.zeros((C,)),
            block_h=4, block_w=8, interpret=True)
        assert (np.asarray(idx) == 1).all()


def test_merged_segment_table_matches_unique_table():
    from nicr_mtsa_tpu.ops.segments import (
        merged_segment_table, unique_table,
    )
    rng = np.random.default_rng(11)
    B, P, C, K, M, S = 3, 4096, 13, 8, 1 << 16, 32
    # merge-structured ids: class * M + rank with rank <= K; include
    # void (0), stuff (rank 0), and sparse thing segments
    cls = rng.integers(0, C, (B, P))
    rank = rng.integers(0, K + 1, (B, P)) * (rng.random((B, P)) < 0.3)
    ids = jnp.asarray((cls * M + rank).astype(np.int32))
    want = unique_table(ids, S)
    got = merged_segment_table(ids, C, K, M, S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chunked_top_k_matches_single_call():
    from nicr_mtsa_tpu.ops.nms import chunked_top_k
    rng = np.random.default_rng(7)
    # heavy ties (quantized values) to stress tie-order equivalence
    flat = jnp.asarray(
        (rng.integers(0, 50, (4, 4096)) / 50.0).astype(np.float32))
    s_c, i_c = chunked_top_k(flat, 64)
    import jax as _jax
    s_1, i_1 = _jax.lax.top_k(flat, 64)
    np.testing.assert_array_equal(np.asarray(s_c), np.asarray(s_1))
    np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_1))

    # non-divisible length falls back to the single call
    s_c2, i_c2 = chunked_top_k(flat[:, :4093], 64)
    s_12, i_12 = _jax.lax.top_k(flat[:, :4093], 64)
    np.testing.assert_array_equal(np.asarray(i_c2), np.asarray(i_12))


class TestFusedLayerNorm:
    """ops/pallas/layernorm.py vs the identically-specified XLA math
    (models/common.py FusedLayerNorm 'xla' backend)."""

    def _xla_ln(self, x, scale, bias):
        # the module's own XLA path is the semantic twin -- no third
        # reimplementation that can drift (eps, variance clamp)
        from nicr_mtsa_tpu.models.common import FusedLayerNorm
        ln = FusedLayerNorm(backend='xla', dtype=x.dtype)
        return ln.apply({'params': {'scale': scale, 'bias': bias}}, x)

    @pytest.mark.parametrize('dtype', [np.float32, jnp.bfloat16])
    def test_matches_xla_math(self, dtype):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 9, 11, 96)) * 3 + 1, dtype)
        scale = jnp.asarray(rng.normal(size=(96,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(96,)), jnp.float32)
        got = fused_layer_norm(x, scale, bias, block_rows=64,
                               interpret=True)
        want = self._xla_ln(x, scale, bias)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=(1e-6 if dtype == np.float32 else 1e-2))

    def test_module_param_tree_matches_nn_layernorm(self):
        import flax.linen as nn
        from nicr_mtsa_tpu.models.common import FusedLayerNorm
        x = jnp.ones((2, 5, 8), jnp.float32)
        v_f = FusedLayerNorm(backend='xla').init(
            jax.random.PRNGKey(0), x)
        v_n = nn.LayerNorm().init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v_f) \
            == jax.tree_util.tree_structure(v_n)
        y_f = FusedLayerNorm(backend='xla').apply(v_f, x)
        y_n = nn.LayerNorm().apply(v_n, x)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_n),
                                   atol=1e-6)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_deeplab_merge_pq_states_match_two_step(seed):
    """`deeplab_merge_pq` (merge composed with the PQ slot mapping;
    structurally over-inclusive pred table with zero-area stuff slots)
    must produce PQ states EQUAL to the two-step path
    merge -> merged_segment_table -> ids_to_slots: PQ is
    slot-permutation-invariant and zero-area slots are inert."""
    from nicr_mtsa_tpu.metrics import PanopticQuality
    from nicr_mtsa_tpu.ops.merge import deeplab_merge_pq
    from nicr_mtsa_tpu.ops.segments import merged_segment_table

    rng = np.random.default_rng(seed)
    H, W, K, C = 30, 40, 8, 9
    thing_ids = (1, 2, 3)
    sem = rng.integers(0, C, (2, H, W)).astype(np.int32)
    ins = rng.integers(0, K + 1, (2, H, W)).astype(np.int32)
    fg = rng.random((2, H, W)) > 0.3
    thing_table = np.array([c in thing_ids for c in range(C)])
    M = 1 << 16
    S_pred = 32

    # a random GT panoptic + its table
    gt_sem = rng.integers(0, C, (2, H, W)).astype(np.int32)
    gt_ins = rng.integers(0, K + 1, (2, H, W)).astype(np.int32)
    gt = deeplab_merge(
        jnp.asarray(gt_sem), jnp.asarray(gt_ins),
        jnp.asarray(rng.random((2, H, W)) > 0.3),
        jnp.asarray(thing_table), max_instances_per_category=M,
        top_k=K, n_classes_with_void=C)
    gt_table = unique_table(gt.panoptic.reshape(2, -1), 64)

    pq = PanopticQuality(
        num_categories=C, ignored_label=0,
        max_instances_per_category=M, is_thing=thing_table)

    old = deeplab_merge(
        jnp.asarray(sem), jnp.asarray(ins), jnp.asarray(fg),
        jnp.asarray(thing_table), max_instances_per_category=M,
        top_k=K, n_classes_with_void=C)
    old_table = merged_segment_table(old.panoptic, C, K, M, S_pred)
    state_old = pq.update_state(
        pq.empty_state(), old.panoptic, gt.panoptic,
        gt_table=gt_table, pred_table=old_table)

    new = deeplab_merge_pq(
        jnp.asarray(sem), jnp.asarray(ins), jnp.asarray(fg),
        jnp.asarray(thing_table), max_instances_per_category=M,
        top_k=K, n_classes_with_void=C, pred_table_size=S_pred)
    state_new = pq.update_state(
        pq.empty_state(), None, gt.panoptic,
        gt_table=gt_table, pred_table=new.pred_table,
        pred_slots=new.slots)

    np.testing.assert_array_equal(
        np.asarray(new.panoptic_id_table),
        np.asarray(old.panoptic_id_table))
    for key in state_old:
        np.testing.assert_allclose(
            np.asarray(state_new[key]), np.asarray(state_old[key]),
            rtol=1e-6, err_msg=key)

    # the slot map is consistent with its own table: looking the slots
    # back up through the table reproduces the merged id map
    table = np.asarray(new.pred_table)
    slots = np.asarray(new.slots).reshape(2, -1)
    ids = np.take_along_axis(table, slots, axis=1)
    np.testing.assert_array_equal(
        ids, np.asarray(old.panoptic).reshape(2, -1))
