"""Task-helper unit tests for normal / DVE / checkpoint policy / CSV
logger plus encoder-fusion variants (reference
tests/test_encoder_fusion.py, test_loss_weighting.py)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.data.preprocessing.base import APPLIED_PREPROCESSING_KEY
from nicr_mtsa_tpu.data._types import (
    AppliedPreprocessingMeta, PreprocessingParameterDict,
)
from nicr_mtsa_tpu.tasks import NormalTaskHelper
from nicr_mtsa_tpu.tasks.dense_visual_embedding import (
    DenseVisualEmbeddingTaskHelper, pad_embedding_luts,
)
from nicr_mtsa_tpu.utils import CheckpointHelper, CSVLogger


def _meta(H, W):
    return AppliedPreprocessingMeta([PreprocessingParameterDict(
        type='Resize',
        valid_region_slice_y=slice(0, H),
        valid_region_slice_x=slice(0, W))])


def test_normal_task_helper():
    B, H, W = 2, 16, 20
    rng = np.random.default_rng(0)
    normal_gt = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    normal_gt /= np.linalg.norm(normal_gt, axis=-1, keepdims=True)
    normal_gt[:, :4] = 0.0     # invalid region

    batch = {
        'normal': jnp.asarray(normal_gt),
        'normal_fullres': jnp.asarray(normal_gt),
        APPLIED_PREPROCESSING_KEY: [_meta(H, W)],
    }
    pred = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    predictions_post = {
        'normal_output': pred,
        'normal_side_outputs': (),
        'normal_output_fullres': pred,
    }

    helper = NormalTaskHelper(loss_name='l1')
    losses, logs = helper.validation_step(batch, 0, predictions_post)
    assert np.isfinite(float(losses['normal_total_loss']))

    # perfect prediction -> zero loss and zero rmse
    helper2 = NormalTaskHelper(loss_name='l1')
    perfect = dict(predictions_post,
                   normal_output=jnp.asarray(normal_gt),
                   normal_output_fullres=jnp.asarray(normal_gt))
    losses2, _ = helper2.validation_step(batch, 0, perfect)
    assert float(losses2['normal_total_loss']) == pytest.approx(0.0)
    _, _, logs2 = helper2.validation_epoch_end()
    assert float(logs2['normal_rmse']) == pytest.approx(0.0, abs=1e-6)


def test_dve_task_helper_loss_and_lut_padding():
    B, H, W, D = 2, 12, 16, 8
    rng = np.random.default_rng(1)

    luts = [rng.normal(size=(3, D)).astype(np.float32),
            rng.normal(size=(5, D)).astype(np.float32)]
    padded = pad_embedding_luts(luts, D)
    assert padded.shape == (2, 6, D)
    assert (padded[0, 0] == 0).all()                 # void row
    np.testing.assert_array_equal(padded[0, 1:4], luts[0])
    np.testing.assert_array_equal(padded[1, 1:6], luts[1])
    assert (padded[0, 4:] == 0).all()                # padding rows

    indices = np.zeros((B, H, W), np.int32)
    indices[0, :6, :] = 1
    indices[1, 6:, :] = 2

    batch = {
        'dense_visual_embedding_lut': luts,
        'dense_visual_embedding_indices': jnp.asarray(indices),
    }

    # predict exactly the target embeddings -> cosine loss 0
    dense_target = padded[np.arange(B)[:, None, None], indices]
    predictions_post = {
        'dense_visual_embedding_output': jnp.asarray(dense_target),
        'dense_visual_embedding_side_outputs': (),
    }
    helper = DenseVisualEmbeddingTaskHelper(n_classes=5,
                                            loss_name='cos_emb')
    losses, _ = helper.training_step(batch, 0, predictions_post)
    assert float(losses['dense_visual_embedding_total_loss']) == \
        pytest.approx(0.0, abs=1e-5)

    # random prediction -> positive loss
    predictions_rand = {
        'dense_visual_embedding_output':
            jnp.asarray(rng.normal(size=(B, H, W, D)), jnp.float32),
        'dense_visual_embedding_side_outputs': (),
    }
    losses_r, _ = helper.training_step(batch, 0, predictions_rand)
    assert float(losses_r['dense_visual_embedding_total_loss']) > 0.1


def test_checkpoint_helper_matching_and_direction():
    helper = CheckpointHelper(metric_names=('miou', 'miou+bacc'),
                              debug=False)
    logs = {'valid_semantic_miou': 0.5, 'valid_scene_bacc': 0.6,
            'train_loss': 1.0}
    result = helper.check_for_checkpoint(dict(logs))
    assert result == {'miou': True, 'miou+bacc': True}

    # worse miou: no checkpoint for miou
    logs2 = {'valid_semantic_miou': 0.4, 'valid_scene_bacc': 0.9}
    result2 = helper.check_for_checkpoint(dict(logs2))
    assert 'miou' not in result2
    assert result2.get('miou+bacc') is True    # 1.3 > 1.1

    # ambiguous match raises
    helper3 = CheckpointHelper(metric_names=('acc',), debug=False)
    with pytest.raises(ValueError):
        helper3.check_for_checkpoint(
            {'valid_acc_a': 1.0, 'valid_acc_b': 2.0})


def test_csv_logger_roundtrip(tmp_path):
    path = os.path.join(tmp_path, 'log.csv')
    logger = CSVLogger(path)
    logger.log({'epoch': 0, 'loss': 1.5})
    logger.log({'epoch': 1, 'loss': 1.2, 'miou': np.float32(0.4)})
    logger.write()

    # resume: union of keys, existing rows preserved
    logger2 = CSVLogger(path)
    logger2.log({'epoch': 2, 'loss': jnp.asarray(1.0)})
    logger2.write()

    import csv
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[0]['epoch'] == '0'
    assert rows[1]['miou'].startswith('0.4')
    assert rows[2]['loss'] == '1.0'


@pytest.mark.parametrize('fusion,dest', [
    ('add', ('rgb', 'depth')),
    ('se-add', ('rgb', 'depth')),
    ('add-uni-rgb', ('rgb',)),
    ('se-add-uni-depth', ('depth',)),
    ('none', ()),
])
def test_encoder_fusion_variants(fusion, dest):
    from nicr_mtsa_tpu.models.encoder_fusion import (
        EncoderRGBDFusionWeightedAdd, get_encoder_fusion_kwargs,
    )
    kwargs = get_encoder_fusion_kwargs(fusion)
    assert tuple(kwargs['destinations']) == dest
    mod = EncoderRGBDFusionWeightedAdd(n_channels_in=16, **kwargs)
    rng = np.random.default_rng(2)
    x = {'rgb': jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32),
         'depth': jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)}
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)

    if fusion == 'none':
        np.testing.assert_array_equal(np.asarray(out['rgb']),
                                      np.asarray(x['rgb']))
        np.testing.assert_array_equal(np.asarray(out['depth']),
                                      np.asarray(x['depth']))
    elif fusion == 'add':
        expected = np.asarray(x['rgb']) + np.asarray(x['depth'])
        np.testing.assert_allclose(np.asarray(out['rgb']), expected,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out['depth']), expected,
                                   rtol=1e-6)
    elif fusion == 'add-uni-rgb':
        expected = np.asarray(x['rgb']) + np.asarray(x['depth'])
        np.testing.assert_allclose(np.asarray(out['rgb']), expected,
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out['depth']),
                                      np.asarray(x['depth']))


def test_checkpoint_save_load_roundtrip(tmp_path):
    from nicr_mtsa_tpu.parallel.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    state = {
        'params': {'dense': {'kernel': jnp.ones((4, 3)),
                             'bias': jnp.zeros((3,))}},
        'step': jnp.asarray(7, jnp.int32),
    }
    extra = {'epoch': 2, 'dwa': {'weights': {'a': 1.5}}}
    path = save_checkpoint(str(tmp_path / 'ckpt'), state, extra=extra)
    loaded, loaded_extra = load_checkpoint(path)

    np.testing.assert_array_equal(
        np.asarray(loaded['params']['dense']['kernel']),
        np.ones((4, 3)))
    assert int(np.asarray(loaded['step'])) == 7
    assert loaded_extra['epoch'] == 2
    assert loaded_extra['dwa']['weights']['a'] == 1.5


def test_dve_fused_metric_states_match_eager():
    """The DVE helper's functional metric-state API (fused eval step)
    must accumulate the same text/visual-mean retrieval confusion
    states as the eager validation_step path."""
    import jax
    from nicr_mtsa_tpu.data.preprocessing.resize import get_fullres_key

    B, H, W = 2, 10, 12
    rng = np.random.default_rng(3)
    n_classes = 5
    target = rng.integers(0, n_classes + 1, (B, H, W)).astype(np.int32)
    text_idx = rng.integers(0, n_classes, (B, H, W)).astype(np.int32)
    vis_idx = rng.integers(0, n_classes, (B, H, W)).astype(np.int32)

    batch = {'semantic_fullres': jnp.asarray(target)}
    preds = {
        get_fullres_key('dense_visual_embedding_text_based'
                        '_semantic_idx'): jnp.asarray(text_idx),
        get_fullres_key('dense_visual_embedding_visual_mean_based'
                        '_semantic_idx'): jnp.asarray(vis_idx),
    }

    helper = DenseVisualEmbeddingTaskHelper(n_classes=n_classes)
    state = helper.update_metric_states(None, batch, preds)
    state = helper.update_metric_states(state, batch, preds)

    eager = DenseVisualEmbeddingTaskHelper(n_classes=n_classes)
    for _ in range(2):
        eager._update_retrieval_miou(
            eager._text_metric_iou, batch, preds,
            get_fullres_key('dense_visual_embedding_text_based'
                            '_semantic_idx'))
        eager._update_retrieval_miou(
            eager._visual_mean_metric_iou, batch, preds,
            get_fullres_key('dense_visual_embedding_visual_mean_based'
                            '_semantic_idx'))

    np.testing.assert_array_equal(
        np.asarray(state['text_cm']),
        np.asarray(eager._text_metric_iou.state))
    np.testing.assert_array_equal(
        np.asarray(state['visual_mean_cm']),
        np.asarray(eager._visual_mean_metric_iou.state))

    # load_metric_states adopts the fused states for epoch_end
    helper.load_metric_states(jax.device_get(state))
    _, _, logs = helper.validation_epoch_end()
    assert 'dense_visual_embedding_text_miou' in logs
    assert 'dense_visual_embedding_visual_mean_miou' in logs
