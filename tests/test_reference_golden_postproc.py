"""Golden tests for the POSTPROCESSING layer against the actual
reference implementation (model/postprocessing/instance.py): center
NMS mask/top-k, offset-vote pixel grouping, and per-instance
orientation readout. Complements tests/test_reference_golden.py
(losses/merge/PQ) so every device postprocessing kernel is pinned to
the reference's behavior directly, not to hand-rolled twins.

The reference assigns instance ids in row-major center order while
this framework uses score-rank slots; comparisons relabel via the
center coordinates, which both implementations report.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from test_reference_golden import (   # noqa: E402
    _PKG, REF_ROOT, _ensure_ref_package, ref_import,
)


def _exec_package_init(name: str, pkg_dir: str):
    """(Re)load a reference package's real __init__.py with submodule
    search locations, replacing any bare stub registered earlier."""
    spec = importlib.util.spec_from_file_location(
        name, f'{pkg_dir}/__init__.py',
        submodule_search_locations=[pkg_dir])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_instance_postprocessing(**kwargs):
    """Reference InstancePostprocessing with the full relative-import
    chain (types, executed utils package, data.preprocessing, model)."""
    _ensure_ref_package()
    for name, path in (
            (f'{_PKG}.data', f'{REF_ROOT}/data'),
            (f'{_PKG}.data.preprocessing', f'{REF_ROOT}/data/preprocessing'),
            (f'{_PKG}.model', f'{REF_ROOT}/model'),
            (f'{_PKG}.model.postprocessing',
             f'{REF_ROOT}/model/postprocessing')):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    ref_import('types')
    # postprocessing does `from ...utils import biternion2rad`: utils
    # must be the executed package, not the bare path stub
    if not hasattr(sys.modules.get(f'{_PKG}.utils'), 'biternion2rad'):
        _exec_package_init(f'{_PKG}.utils', f'{REF_ROOT}/utils')
    mod = ref_import('model.postprocessing.instance')
    return mod.InstancePostprocessing(**kwargs)


def _quantized_heatmap(rng, B, H, W, levels=8):
    """Quantized to few levels: forces exact-tie plateaus inside NMS
    windows (the case the reference's pooling-index trick exists for)."""
    return np.round(rng.random((B, H, W)).astype(np.float32)
                    * levels) / levels


def _t(x):
    return torch.tensor(np.asarray(x))


# --------------------------------------------------------------------------
# center NMS
# --------------------------------------------------------------------------

@pytest.mark.parametrize('seed', [0, 1])
@pytest.mark.parametrize('kernel_size', [3, 5])
def test_center_nms_mask_golden(seed, kernel_size):
    """Survivor MASK equality on tie-heavy heatmaps (K large enough to
    keep every survivor, so top-k never truncates)."""
    from nicr_mtsa_tpu.ops.nms import nms_keep_mask

    B, H, W = 2, 32, 40
    rng = np.random.default_rng(seed)
    hm = _quantized_heatmap(rng, B, H, W)

    # 254 = the reference's uint8-id top-k ceiling; a 32x40 quantized
    # heatmap has ~140 window maxima, so no truncation occurs
    ref = _ref_instance_postprocessing(
        heatmap_threshold=0.1, heatmap_nms_kernel_size=kernel_size,
        top_k_instances=254)
    ref_mask, _ = ref._get_instance_centers(_t(hm[:, None]).clone())

    mask = np.asarray(nms_keep_mask(hm, threshold=0.1,
                                    kernel_size=kernel_size))
    np.testing.assert_array_equal(mask, ref_mask.numpy().astype(bool))


@pytest.mark.parametrize('seed', [0, 3])
def test_center_topk_golden(seed):
    """With small K (truncating top-k): the kept center set and scores
    must match the reference's variable-length lists."""
    from nicr_mtsa_tpu.ops.nms import get_instance_centers

    B, H, W, K = 2, 48, 64, 12
    rng = np.random.default_rng(seed)
    hm = rng.random((B, H, W)).astype(np.float32)   # continuous: no ties

    ref = _ref_instance_postprocessing(
        heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
        top_k_instances=K)
    _, ref_lists = ref._get_instance_centers(_t(hm[:, None]).clone())

    mine = get_instance_centers(hm, threshold=0.1, kernel_size=3,
                                top_k=K)
    yx = np.asarray(mine.yx)
    valid = np.asarray(mine.valid)
    score = np.asarray(mine.score)

    for b in range(B):
        ref_set = {tuple(c) for c in ref_lists[b].numpy().tolist()}
        my_set = {tuple(c) for c in yx[b][valid[b]].tolist()}
        assert my_set == ref_set, (b, my_set ^ ref_set)
        ref_scores = np.sort(hm[b][tuple(np.array(sorted(ref_set)).T)])
        np.testing.assert_allclose(
            np.sort(score[b][valid[b]]), ref_scores, rtol=0, atol=0)


# --------------------------------------------------------------------------
# pixel grouping
# --------------------------------------------------------------------------

def _relabel_to_slots(ref_seg, ref_meta, yx, valid):
    """Map reference row-major instance ids onto this framework's
    score-rank slot ids via center coordinates."""
    out = np.zeros_like(ref_seg, np.int32)
    slot_of = {tuple(c): s + 1
               for s, c in enumerate(yx.tolist()) if valid[s]}
    for ref_id, meta in ref_meta.items():
        out[ref_seg == ref_id] = slot_of[tuple(meta['center_yx'])]
    return out


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('offset_thr', [None, 12.0])
def test_grouping_golden(seed, offset_thr):
    from nicr_mtsa_tpu.ops.grouping import get_instance_segmentation

    B, H, W, K = 2, 48, 64, 16
    rng = np.random.default_rng(seed)
    hm = rng.random((B, H, W)).astype(np.float32)
    offset = rng.normal(0, 8, size=(B, H, W, 2)).astype(np.float32)
    fg = rng.random((B, H, W)) > 0.4

    ref = _ref_instance_postprocessing(
        heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
        top_k_instances=K, offset_distance_threshold=offset_thr)
    ref_seg, ref_meta = ref._get_instance_segmentation(
        _t(hm[:, None]).clone(),
        _t(offset.transpose(0, 3, 1, 2)),       # (B, 2, H, W), (dy, dx)
        _t(fg))

    mine = get_instance_segmentation(
        hm, offset, fg, threshold=0.1, kernel_size=3, top_k=K,
        offset_distance_threshold=offset_thr)
    seg = np.asarray(mine.segmentation)
    yx = np.asarray(mine.centers.yx)
    valid = np.asarray(mine.centers.valid)
    areas = np.asarray(mine.areas)

    for b in range(B):
        ref_relab = _relabel_to_slots(ref_seg[b].numpy(), ref_meta[b],
                                      yx[b], valid[b])
        np.testing.assert_array_equal(seg[b], ref_relab)
        # per-instance meta: areas + scores at matched slots
        slot_of = {tuple(c): s + 1
                   for s, c in enumerate(yx[b].tolist()) if valid[b][s]}
        for ref_id, meta in ref_meta[b].items():
            s = slot_of[tuple(meta['center_yx'])]
            assert int(areas[b][s]) == int(meta['area']), (b, ref_id)
            np.testing.assert_allclose(
                float(np.asarray(mine.scores)[b][s - 1]),
                float(meta['score']), rtol=1e-6)


# --------------------------------------------------------------------------
# semantic / DVE inference postprocessing (incl. valid-region + fullres)
# --------------------------------------------------------------------------

def _ref_postproc_class(name, cls):
    _ref_instance_postprocessing(top_k_instances=4)   # primes the pkg chain
    return getattr(ref_import(f'model.postprocessing.{name}'), cls)


def _paired_batches(B, H0, W0, sy, sx):
    """(our NHWC numpy batch, ref NCHW torch batch) with identical
    Resize provenance meta and a fullres rgb shape anchor."""
    meta = [[{'type': 'Resize',
              'valid_region_slice_y': sy,
              'valid_region_slice_x': sx}] for _ in range(B)]
    mine = {'rgb_fullres': np.zeros((B, H0, W0, 3), np.uint8),
            '_applied_preprocessing': meta}
    ref = {'rgb_fullres': torch.zeros((B, 3, H0, W0)),
           '_applied_preprocessing': meta}
    return mine, ref


@pytest.mark.parametrize('seed', [0, 1])
def test_semantic_postproc_inference_golden(seed):
    """Full _postprocess_inference key-for-key vs the reference:
    softmax/score/idx plus the valid-region crop + fullres bilinear
    resize chain."""
    from nicr_mtsa_tpu.postprocessing import SemanticPostprocessing

    RefSemantic = _ref_postproc_class('semantic', 'SemanticPostprocessing')
    B, h, w, C, H0, W0 = 2, 24, 32, 12, 40, 56
    sy, sx = slice(0, 20), slice(0, w)       # aspect-ratio padding rows
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 3, size=(B, h, w, C)).astype(np.float32)
    mine_batch, ref_batch = _paired_batches(B, H0, W0, sy, sx)

    ref_out = RefSemantic()._postprocess_inference(
        (_t(logits.transpose(0, 3, 1, 2)), None), ref_batch)
    my_out = SemanticPostprocessing()._postprocess_inference(
        (logits, None), mine_batch)

    for key, chan_last, exact in (
            ('semantic_softmax_scores', True, False),
            ('semantic_segmentation_score', False, False),
            ('semantic_segmentation_idx', False, True),
            ('semantic_output_fullres', True, False),
            ('semantic_softmax_scores_fullres', True, False),
            ('semantic_segmentation_score_fullres', False, False),
            ('semantic_segmentation_idx_fullres', False, True)):
        ref_v = ref_out[key].numpy()
        if chan_last:
            ref_v = ref_v.transpose(0, 2, 3, 1)
        mine = np.asarray(my_out[key])
        if exact:
            np.testing.assert_array_equal(mine, ref_v, err_msg=key)
        else:
            # 1e-4: the blocked 2-tap resize (upsampling.py
            # _resize_axis_linear) rounds f32 interpolation in a
            # different (separable) order than torch's fused 4-tap
            np.testing.assert_allclose(mine, ref_v, atol=1e-4,
                                       err_msg=key)


@pytest.mark.parametrize('seed', [0])
def test_dve_postproc_inference_golden(seed):
    """DVE retrieval postprocessing vs the reference: L2 normalize,
    cosine-similarity logits against text AND visual-mean class
    embeddings, softmax/score/idx, and the fullres chain."""
    from nicr_mtsa_tpu.postprocessing import (
        DenseVisualEmbeddingPostprocessing,
    )

    RefDVE = _ref_postproc_class(
        'dense_visual_embedding', 'DenseVisualEmbeddingPostprocessing')
    B, h, w, D, C, H0, W0 = 2, 24, 32, 16, 10, 40, 56
    sy, sx = slice(0, 20), slice(0, w)
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(B, h, w, D)).astype(np.float32)
    text = rng.normal(size=(C, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    vis = rng.normal(size=(C, D)).astype(np.float32)
    vis /= np.linalg.norm(vis, axis=1, keepdims=True)
    mine_batch, ref_batch = _paired_batches(B, H0, W0, sy, sx)

    ref_out = RefDVE(
        with_text_embeddings_per_class=True,
        text_embeddings_per_class=_t(text),
        with_mean_visual_embedding_per_class=True,
        mean_visual_embedding_per_class=_t(vis),
    )._postprocess_inference(
        (_t(emb.transpose(0, 3, 1, 2)).clone(), None), ref_batch)
    my_out = DenseVisualEmbeddingPostprocessing(
        with_text_embeddings_per_class=True,
        text_embeddings_per_class=text,
        with_mean_visual_embedding_per_class=True,
        mean_visual_embedding_per_class=vis,
    )._postprocess_inference((emb, None), mine_batch)

    for prefix in ('dense_visual_embedding_text_based_semantic',
                   'dense_visual_embedding_visual_mean_based_semantic'):
        for suffix, chan_last, exact in (
                ('_output', True, False),
                ('_softmax_scores', True, False),
                ('_score', False, False),
                ('_idx', False, True),
                ('_output_fullres', True, False),
                ('_softmax_scores_fullres', True, False),
                ('_score_fullres', False, False),
                ('_idx_fullres', False, True)):
            key = prefix + suffix
            ref_v = ref_out[key].numpy()
            if chan_last:
                ref_v = ref_v.transpose(0, 2, 3, 1)
            mine = np.asarray(my_out[key])
            if exact:
                np.testing.assert_array_equal(mine, ref_v, err_msg=key)
            else:
                np.testing.assert_allclose(mine, ref_v, atol=1e-4,
                                           err_msg=key)


def test_collate_golden():
    """mt_collate structure/value equivalence with the reference
    collate (which operates on torch tensors; ours is the numpy
    equivalent): same-shape entries stack, ragged entries and
    CollateIgnoredDict stay lists, nested dicts recurse, scalars
    become (B,) arrays."""
    import sys
    from test_reference_golden import _PKG
    from test_reference_golden_preproc import _ref_preproc
    # any preprocessing load executes the real data package __init__
    _ref_preproc('semantic', 'SemanticClassMapper',
                 classes_to_map=(), new_label=0)
    ref_data = sys.modules[f'{_PKG}.data']
    from nicr_mtsa_tpu.data import mt_collate
    from nicr_mtsa_tpu.data._types import CollateIgnoredDict

    rng = np.random.default_rng(0)
    dense = [rng.normal(size=(4, 5)).astype(np.float32)
             for _ in range(3)]
    ragged = [rng.normal(size=(k + 2, 3)).astype(np.float32)
              for k in range(3)]

    my_samples, ref_samples = [], []
    for i in range(3):
        my_samples.append({
            'dense': dense[i], 'ragged': ragged[i], 'scalar': i,
            'ignored': CollateIgnoredDict({i: i * 2}),
            'nested': {'dense': dense[i] * 2},
        })
        ref_samples.append({
            'dense': _t(dense[i]), 'ragged': _t(ragged[i]), 'scalar': i,
            'ignored': ref_data.CollateIgnoredDict({i: i * 2}),
            'nested': {'dense': _t(dense[i] * 2)},
        })

    mine = mt_collate(my_samples)
    ref = ref_data.mt_collate(ref_samples)

    np.testing.assert_array_equal(np.asarray(mine['dense']),
                                  ref['dense'].numpy())
    np.testing.assert_array_equal(np.asarray(mine['nested']['dense']),
                                  ref['nested']['dense'].numpy())
    np.testing.assert_array_equal(np.asarray(mine['scalar']),
                                  np.asarray(ref['scalar']))
    assert isinstance(mine['ragged'], list) \
        and isinstance(ref['ragged'], list)
    for m, r in zip(mine['ragged'], ref['ragged']):
        np.testing.assert_array_equal(np.asarray(m), r.numpy())
    assert isinstance(mine['ignored'], list) \
        and isinstance(ref['ignored'], list)
    assert [dict(d) for d in mine['ignored']] \
        == [dict(d) for d in ref['ignored']]


def test_scene_postproc_inference_golden():
    from nicr_mtsa_tpu.postprocessing import ScenePostprocessing

    RefScene = _ref_postproc_class('scene', 'ScenePostprocessing')
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, size=(4, 10)).astype(np.float32)

    ref_out = RefScene()._postprocess_inference((_t(logits), None), {})
    my_out = ScenePostprocessing()._postprocess_inference(
        (logits, None), {})
    np.testing.assert_array_equal(
        np.asarray(my_out['scene_class_idx']),
        ref_out['scene_class_idx'].numpy())
    np.testing.assert_allclose(
        np.asarray(my_out['scene_class_score']),
        ref_out['scene_class_score'].numpy(), atol=1e-6)


def test_normal_postproc_inference_golden():
    """Nearest fullres resize index mapping must match torch's
    floor(dst*in/out) exactly."""
    from nicr_mtsa_tpu.postprocessing import NormalPostprocessing

    RefNormal = _ref_postproc_class('normal', 'NormalPostprocessing')
    B, h, w, H0, W0 = 2, 24, 32, 40, 56
    sy, sx = slice(0, 20), slice(0, w)
    rng = np.random.default_rng(0)
    normals = rng.normal(size=(B, h, w, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    mine_batch, ref_batch = _paired_batches(B, H0, W0, sy, sx)
    # the fullres shape anchor for 'normal' falls back to rgb_fullres

    ref_out = RefNormal()._postprocess_inference(
        (_t(normals.transpose(0, 3, 1, 2)), None), ref_batch)
    my_out = NormalPostprocessing()._postprocess_inference(
        (normals, None), mine_batch)
    np.testing.assert_allclose(
        np.asarray(my_out['normal_output_fullres']),
        ref_out['normal_output_fullres'].numpy().transpose(0, 2, 3, 1),
        atol=1e-6)


# --------------------------------------------------------------------------
# orientation readout
# --------------------------------------------------------------------------

@pytest.mark.parametrize('seed', [0, 1])
def test_orientation_readout_golden(seed):
    from nicr_mtsa_tpu.ops.grouping import (
        get_instance_segmentation, instance_orientations,
    )

    B, H, W, K = 2, 48, 64, 16
    rng = np.random.default_rng(seed)
    hm = rng.random((B, H, W)).astype(np.float32)
    offset = rng.normal(0, 8, size=(B, H, W, 2)).astype(np.float32)
    fg = rng.random((B, H, W)) > 0.4
    ang = rng.uniform(-np.pi, np.pi, size=(B, H, W))
    ori = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)

    seg = np.asarray(get_instance_segmentation(
        hm, offset, fg, threshold=0.1, kernel_size=3,
        top_k=K).segmentation)

    ref = _ref_instance_postprocessing(
        heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
        top_k_instances=K)
    ref_orients = ref._get_instance_orientation(
        _t(ori.transpose(0, 3, 1, 2)), _t(seg.astype(np.int64)), _t(fg))

    mine = np.asarray(instance_orientations(ori, seg, fg, top_k=K))
    for b in range(B):
        assert ref_orients[b], 'fixture produced no instances'
        for inst_id, ref_angle in ref_orients[b].items():
            np.testing.assert_allclose(mine[b][inst_id], ref_angle,
                                       atol=1e-5)
