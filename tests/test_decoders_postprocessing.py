"""Decoder + postprocessing matrix (reference
tests/test_decoders+postprocessing.py:31-358): task x decoder type x
train/eval, asserting the complete output-key contract."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.data._types import (
    AppliedPreprocessingMeta, PreprocessingParameterDict,
)
from nicr_mtsa_tpu.data.preprocessing.base import APPLIED_PREPROCESSING_KEY
from nicr_mtsa_tpu.models.decoders import (
    EmbeddingDecoder, EmbeddingMLPDecoder,
    InstanceDecoder, InstanceMLPDecoder,
    NormalDecoder, NormalMLPDecoder,
    SceneClassificationDecoder,
    SemanticDecoder, SemanticMLPDecoder,
)
from nicr_mtsa_tpu.postprocessing import (
    DenseVisualEmbeddingPostprocessing,
    InstancePostprocessing,
    NormalPostprocessing,
    PanopticPostprocessing,
    ScenePostprocessing,
    SemanticPostprocessing,
)

H, W = 64, 96
N_CLASSES = 8      # without void
IS_THING = tuple(i < 3 for i in range(N_CLASSES))


def _decoder_kwargs(mlp):
    common = dict(
        n_channels_in=64, downsampling_in=32,
        fusion_n_channels=(48, 32, 24), fusion_downsamplings=(16, 8, 4),
        upsampling='bilinear', prediction_upsampling='bilinear',
    )
    if mlp:
        common.update(n_channels=(48, 32, 32, 32), fusion='select-rgb')
    else:
        common.update(n_channels=(48, 32, 24), downsamplings=(16, 8, 4),
                      block='basicblock', n_blocks=1, fusion='add-rgb')
    return common


def _inputs():
    rng = np.random.default_rng(0)

    def r(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    skips = {'16': {'rgb': r(2, H // 16, W // 16, 48)},
             '8': {'rgb': r(2, H // 8, W // 8, 32)},
             '4': {'rgb': r(2, H // 4, W // 4, 24)}}
    x = (r(2, H // 32, W // 32, 64), (r(2, 1, 1, 64),))
    return x, skips


def _batch():
    rng = np.random.default_rng(1)
    meta = [AppliedPreprocessingMeta([PreprocessingParameterDict(
        type='Resize', valid_region_slice_y=slice(0, H),
        valid_region_slice_x=slice(0, W))])]
    return {
        APPLIED_PREPROCESSING_KEY: meta,
        'semantic_fullres': rng.integers(0, N_CLASSES + 1, (2, 128, 192)),
        'instance_fullres': rng.integers(0, 5, (2, 128, 192)),
        'normal_fullres': rng.normal(size=(2, 128, 192, 3)),
        'instance_foreground':
            jnp.asarray(rng.random((2, H, W)) > 0.5),
        'instance': jnp.asarray(rng.integers(0, 5, (2, H, W)), jnp.int32),
        'orientation_foreground':
            jnp.asarray(rng.random((2, H, W)) > 0.5),
    }


def _run_decoder(decoder, train):
    x, skips = _inputs()
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    variables = decoder.init(rngs, x, skips, train=train)
    if train:
        out, _ = decoder.apply(variables, x, skips, train=True,
                               rngs={'dropout': jax.random.PRNGKey(2)},
                               mutable=['batch_stats'])
    else:
        out = decoder.apply(variables, x, skips, train=False)
    return out


@pytest.mark.parametrize('mlp', [False, True])
@pytest.mark.parametrize('train', [False, True])
def test_semantic_contract(mlp, train):
    cls = SemanticMLPDecoder if mlp else SemanticDecoder
    dec = cls(n_classes=N_CLASSES, **_decoder_kwargs(mlp))
    raw = _run_decoder(dec, train)
    post = SemanticPostprocessing()
    r = post.postprocess(raw, _batch(), is_training=train)

    keys = {'semantic_output', 'semantic_side_outputs'}
    if not train:
        keys |= {'semantic_softmax_scores', 'semantic_segmentation_score',
                 'semantic_segmentation_idx', 'semantic_output_fullres',
                 'semantic_softmax_scores_fullres',
                 'semantic_segmentation_score_fullres',
                 'semantic_segmentation_idx_fullres'}
    assert keys <= set(r.keys())
    assert r['semantic_output'].shape == (2, H, W, N_CLASSES)
    if not train:
        assert r['semantic_segmentation_idx_fullres'].shape == (2, 128, 192)


@pytest.mark.parametrize('mlp', [False, True])
def test_instance_contract(mlp):
    cls = InstanceMLPDecoder if mlp else InstanceDecoder
    dec = cls(with_orientation=True, **_decoder_kwargs(mlp))
    raw = _run_decoder(dec, train=False)
    post = InstancePostprocessing(top_k_instances=16)
    r = post.postprocess(raw, _batch(), is_training=False)

    for key in ('instance_output', 'instance_side_outputs',
                'instance_centers', 'instance_offsets',
                'instance_segmentation_gt_foreground',
                'instance_segmentation_gt_meta',
                'instance_segmentation_gt_foreground_fullres',
                'orientations_gt_instance_gt_orientation_foreground',
                'orientations_instance_segmentation'
                '_gt_orientation_foreground'):
        assert key in r, key
    assert r['instance_segmentation_gt_foreground'].shape == (2, H, W)
    meta = r['instance_segmentation_gt_meta']
    assert meta['centers_yx'].shape == (2, 16, 2)
    assert meta['areas'].shape == (2, 17)


@pytest.mark.parametrize('compute_scores', [False, True])
def test_panoptic_contract(compute_scores):
    sem = SemanticDecoder(n_classes=N_CLASSES, **_decoder_kwargs(False))
    inst = InstanceDecoder(with_orientation=True,
                           **_decoder_kwargs(False))
    s_raw = _run_decoder(sem, train=False)
    i_raw = _run_decoder(inst, train=False)

    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(top_k_instances=16),
        semantic_classes_is_thing=IS_THING,
        semantic_class_has_orientation=IS_THING,
        compute_scores=compute_scores)
    r = post.postprocess(((s_raw[0], i_raw[0]), (s_raw[1], i_raw[1])),
                         _batch(), is_training=False)

    keys = {'panoptic_foreground_mask', 'panoptic_segmentation_deeplab',
            'panoptic_segmentation_deeplab_fullres',
            'panoptic_segmentation_deeplab_ids',
            'panoptic_segmentation_deeplab_semantic_idx',
            'panoptic_segmentation_deeplab_semantic_idx_fullres',
            'panoptic_segmentation_deeplab_instance_idx',
            'panoptic_segmentation_deeplab_instance_idx_fullres',
            'panoptic_segmentation_deeplab_instance_meta',
            'orientations_panoptic_segmentation_deeplab_instance'}
    if compute_scores:
        keys |= {'panoptic_segmentation_deeplab_semantic_score',
                 'panoptic_segmentation_deeplab_semantic_score_fullres',
                 'panoptic_segmentation_deeplab_instance_score',
                 'panoptic_segmentation_deeplab_instance_score_fullres',
                 'panoptic_segmentation_deeplab_panoptic_score',
                 'panoptic_segmentation_deeplab_panoptic_score_fullres'}
    assert keys <= set(r.keys())

    # panoptic ids decompose into (class, instance) consistently
    pan = np.asarray(r['panoptic_segmentation_deeplab'])
    M = post.max_instances_per_category
    assert (pan // M <= N_CLASSES).all()
    if compute_scores:
        score = np.asarray(
            r['panoptic_segmentation_deeplab_panoptic_score'])
        assert score.min() >= 0.0 and score.max() <= 1.0 + 1e-5


@pytest.mark.parametrize('mlp', [False, True])
def test_normal_contract(mlp):
    cls = NormalMLPDecoder if mlp else NormalDecoder
    dec = cls(**_decoder_kwargs(mlp))
    raw = _run_decoder(dec, train=False)
    r = NormalPostprocessing().postprocess(raw, _batch(),
                                           is_training=False)
    assert {'normal_output', 'normal_side_outputs',
            'normal_output_fullres'} <= set(r.keys())
    assert r['normal_output_fullres'].shape == (2, 128, 192, 3)


def test_scene_contract():
    dec = SceneClassificationDecoder(n_channels_in=64, n_classes=5)
    raw = _run_decoder(dec, train=False)
    r = ScenePostprocessing().postprocess(raw, _batch(),
                                          is_training=False)
    assert {'scene_output', 'scene_class_score',
            'scene_class_idx'} <= set(r.keys())
    assert r['scene_class_idx'].shape == (2,)


@pytest.mark.parametrize('mlp', [False, True])
def test_dve_contract(mlp):
    cls = EmbeddingMLPDecoder if mlp else EmbeddingDecoder
    dec = cls(embedding_dim=32, **_decoder_kwargs(mlp))
    raw = _run_decoder(dec, train=False)

    rng = np.random.default_rng(2)
    text = rng.normal(size=(N_CLASSES, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    post = DenseVisualEmbeddingPostprocessing(
        with_text_embeddings_per_class=True,
        text_embeddings_per_class=text)
    r = post.postprocess(raw, _batch(), is_training=False)

    for key in ('dense_visual_embedding_output',
                'dense_visual_embedding_text_based_semantic_output',
                'dense_visual_embedding_text_based_semantic_idx',
                'dense_visual_embedding_text_based_semantic_idx_fullres',
                'dense_visual_embedding_text_based_semantic_score'):
        assert key in r, key
    idx = np.asarray(r['dense_visual_embedding_text_based_semantic_idx'])
    assert idx.max() < N_CLASSES


def test_pq_orientation_mae_device_path():
    """Known-angle check of the orientation-aware PQ: two perfectly
    matched segments with angle errors 0.2 and 0.4 -> MAE 0.3."""
    from nicr_mtsa_tpu.metrics import PanopticQualityWithOrientationMAE
    from nicr_mtsa_tpu.ops.segments import SEGMENT_TABLE_PAD

    M = 16
    pan = np.zeros((1, 8, 8), np.int32)
    pan[0, :4] = 1 * M + 1     # thing class 1, instance 1
    pan[0, 4:] = 1 * M + 2     # thing class 1, instance 2
    pan_j = jnp.asarray(pan)

    table = np.full((1, 8), SEGMENT_TABLE_PAD, np.int32)
    table[0, :2] = [1 * M + 1, 1 * M + 2]
    gt_angle = np.zeros((1, 8), np.float32)
    gt_angle[0, :2] = [1.0, 2.0]
    gt_valid = np.zeros((1, 8), bool)
    gt_valid[0, :2] = True

    pq = PanopticQualityWithOrientationMAE(
        num_categories=2, ignored_label=0,
        max_instances_per_category=M, is_thing=[False, True],
        gt_table_size=8, pred_table_size=8)
    pq.update(
        pan_j, pan_j,
        gt_table=jnp.asarray(table), pred_table=jnp.asarray(table),
        gt_angle=jnp.asarray(gt_angle),
        gt_angle_valid=jnp.asarray(gt_valid),
        pred_angle=jnp.asarray([[1.2, 2.4, 0, 0, 0, 0, 0, 0]],
                               jnp.float32),
        pred_angle_valid=jnp.asarray(gt_valid))

    results = pq.compute()
    assert results['all_pq'] == pytest.approx(1.0)
    assert results['mae_rad'] == pytest.approx(0.3, abs=1e-5)
