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
