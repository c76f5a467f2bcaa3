"""End-to-end pipeline tests: real preprocessing chain -> multi-task
model -> jitted train step -> validation with on-device metrics.
This mirrors the reference's integration level
(tests/test_decoders+postprocessing.py) plus the trainer wiring the
reference delegates to EMSANet."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.data import mt_collate
from nicr_mtsa_tpu.data.preprocessing import (
    Compose, FullResCloner, InstanceClearStuffIDs, InstanceTargetGenerator,
    MultiscaleSupervisionGenerator, NormalizeDepth, NormalizeRGB,
    OrientationTargetGenerator, PanopticTargetGenerator, Resize,
    ToDeviceArrays,
)
from nicr_mtsa_tpu.models.multi_task import (
    MultiTaskModelConfig, build_model,
)
from nicr_mtsa_tpu.pipeline import (
    MultiTaskPipeline, default_postprocessors, strip_non_arrays,
)
from nicr_mtsa_tpu.tasks import (
    InstanceTaskHelper, PanopticTaskHelper, SceneTaskHelper,
    SemanticTaskHelper,
)
from nicr_mtsa_tpu.testing import get_dummy_sample
from nicr_mtsa_tpu.testing.preprocessing import (
    N_TEST_CLASSES_WITH_VOID, TEST_CLASSES_IS_THING_WITH_VOID,
)
from nicr_mtsa_tpu.weighting import FixedLossWeighting


H, W = 96, 128
IS_THING = TEST_CLASSES_IS_THING_WITH_VOID
N_CLASSES = N_TEST_CLASSES_WITH_VOID            # with void


def make_batch(batch_size=2, train=True):
    pre = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=IS_THING),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=H, width=W),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32),
            keys=('semantic', 'instance', 'orientations')),
        InstanceTargetGenerator(
            sigma=8, semantic_classes_is_thing=IS_THING,
            sigma_for_additional_downscales={4: 2, 8: 2, 16: 1, 32: 1}),
        OrientationTargetGenerator(
            semantic_classes_estimate_orientation=IS_THING),
        PanopticTargetGenerator(semantic_classes_is_thing=IS_THING),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])
    samples = []
    for i in range(batch_size):
        s = get_dummy_sample()
        s['scene'] = (i % 2) + 1     # classes 1, 2 (0 = void)
        samples.append(pre(s))
    return mt_collate(samples)


def make_pipeline():
    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock',
        context_module='ppm',
        context_n_channels=128,
        input_size=(H, W),
        decoder_n_channels=(64, 48, 32),
        decoder_n_blocks=1,
        upsampling='bilinear',
        prediction_upsampling='bilinear',
        semantic_n_classes=N_CLASSES - 1,
        scene_n_classes=4,
    )
    model = build_model(config)
    postprocessors = default_postprocessors(
        tasks=config.tasks + ('panoptic',),
        semantic_classes_is_thing=IS_THING[1:],
        top_k_instances=32,
    )
    task_helpers = {
        'semantic': SemanticTaskHelper(n_classes=N_CLASSES - 1),
        'instance': InstanceTaskHelper(
            semantic_n_classes=N_CLASSES,
            semantic_classes_is_thing=IS_THING,
            top_k_instances=32),
        'panoptic': PanopticTaskHelper(
            semantic_n_classes=N_CLASSES,
            semantic_classes_is_thing=IS_THING),
        'scene': SceneTaskHelper(n_classes=4),
    }
    loss_weighting = FixedLossWeighting({
        'semantic_total_loss': 1.0,
        'instance_center_total_loss': 1.0,
        'instance_offset_total_loss': 1.0,
        'instance_orientation_total_loss': 1.0,
        'scene_total_loss': 1.0,
    })
    return MultiTaskPipeline(
        model=model, postprocessors=postprocessors,
        task_helpers=task_helpers, loss_weighting=loss_weighting)


@pytest.fixture(scope='module')
def pipeline_and_state():
    pipeline = make_pipeline()
    batch = make_batch()
    inputs = pipeline.model_inputs(batch)
    state = pipeline.create_train_state(jax.random.PRNGKey(0), inputs)
    return pipeline, state, batch


def test_train_step(pipeline_and_state):
    pipeline, state, batch = pipeline_and_state
    jit_batch = strip_non_arrays(batch)

    state1, losses = pipeline.train_step(state, jit_batch, batch_idx=0,
                                         rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(losses['total_loss']))
    for key in ('semantic_total_loss', 'instance_center_total_loss',
                'instance_offset_total_loss',
                'instance_orientation_total_loss', 'scene_total_loss'):
        assert key in losses, key
        assert np.isfinite(float(losses[key])), key

    # params actually changed, step advanced
    assert int(state1['step']) == int(state['step']) + 1
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(state['params']),
                        jax.tree_util.tree_leaves(state1['params'])))
    assert diff > 0.0

    # second step reuses the compiled program
    state2, losses2 = pipeline.train_step(state1, jit_batch, batch_idx=1,
                                          rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(losses2['total_loss']))


def test_validation_and_epoch_end(pipeline_and_state):
    pipeline, state, batch = pipeline_and_state

    predictions_post, losses, logs = pipeline.validation_step(
        state, batch, batch_idx=0)

    # output-key contract (inference keys)
    for key in ('semantic_segmentation_idx',
                'semantic_segmentation_idx_fullres',
                'instance_segmentation_gt_foreground',
                'panoptic_segmentation_deeplab',
                'panoptic_segmentation_deeplab_fullres',
                'panoptic_segmentation_deeplab_semantic_idx',
                'orientations_panoptic_segmentation_deeplab_instance',
                'scene_class_idx'):
        assert key in predictions_post, key

    assert predictions_post['semantic_segmentation_idx'].shape == (2, H, W)
    assert predictions_post[
        'semantic_segmentation_idx_fullres'].shape == (2, 512, 512)

    artifacts, examples, logs = pipeline.validation_epoch_end()
    for key in ('semantic_miou', 'panoptic_all_deeplab_pq',
                'panoptic_deeplab_semantic_miou',
                'instance_all_deeplab_pq', 'scene_acc', 'scene_bacc',
                'orientation_mae_gt_rad'):
        assert key in logs, (key, sorted(logs))
    assert 0.0 <= float(logs['panoptic_all_deeplab_pq']) <= 1.0
    assert 'semantic_cm' in artifacts


def test_fused_eval_step(pipeline_and_state):
    """Forward + postprocessing + metric-state updates in ONE jitted
    program; states adopted by the stateful helpers must reproduce the
    eager validation results."""
    pipeline, state, batch = pipeline_and_state
    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )

    static_batch = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
    }
    step = pipeline.make_fused_eval_step(static_batch)

    arrays = strip_non_arrays(batch)
    states = {name: helper.empty_metric_states()
              for name, helper in pipeline.task_helpers.items()
              if hasattr(helper, 'empty_metric_states')}

    predictions_post, losses, states = step(
        state['params'], state['batch_stats'], arrays, states)
    # run twice: states accumulate
    predictions_post, losses, states = step(
        state['params'], state['batch_stats'], arrays, states)

    assert np.isfinite(float(losses['semantic_total_loss']))
    assert 'panoptic_segmentation_deeplab' in predictions_post

    # adopt states and compute epoch metrics
    pipeline.task_helpers['semantic']._metric_iou.state = \
        states['semantic']
    pipeline.task_helpers['panoptic'].load_metric_states(
        states['panoptic'])
    pipeline.task_helpers['instance'].load_metric_states(
        states['instance'])
    pipeline.task_helpers['scene']._cm_state = states['scene']
    artifacts, _, logs = pipeline.validation_epoch_end()
    assert 'semantic_miou' in logs
    assert 0.0 <= float(logs['panoptic_all_deeplab_pq']) <= 1.0
    assert 'instance_all_deeplab_pq' in logs
    # two identical batches -> confusion counts = 2x non-void pixels
    assert int(np.asarray(artifacts['semantic_cm']).sum()) == \
        2 * int((batch['semantic_fullres'] != 0).sum())

    # the fused instance-PQ-with-GT-semantic states (ref task_helper/
    # instance.py:35-436 validation) must equal the eager
    # validation_step accumulation over the same two batches -- this
    # also checks the precomputed 'panoptic_gt_angle_table' path
    # against validation_step's host dict walk (gt_slot_angles)
    helper = pipeline.task_helpers['instance']
    pan_helper = pipeline.task_helpers['panoptic']
    helper._mae_pq_deeplab.reset()
    pan_helper._mae_pq_deeplab.reset()
    pipeline.validation_step(state, batch, batch_idx=0)
    pipeline.validation_step(state, batch, batch_idx=1)
    eager = jax.device_get(helper._mae_pq_deeplab.state)
    fused = jax.device_get(states['instance']['pq'])
    for key, val in eager.items():
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(val), rtol=1e-5,
            err_msg=f'instance pq state {key}')
    # panoptic: the fused step consumes the merge-produced slot map
    # (ops/merge.deeplab_merge_pq via the postprocessor keys) while
    # eager validation_step re-derives the table from the fullres id
    # map -- the two formulations must accumulate equal PQ states
    eager_pan = jax.device_get(pan_helper._mae_pq_deeplab.state)
    fused_pan = jax.device_get(states['panoptic']['pq'])
    for key, val in eager_pan.items():
        np.testing.assert_allclose(
            np.asarray(fused_pan[key]), np.asarray(val), rtol=1e-5,
            err_msg=f'panoptic pq state {key}')


def test_emsaformer_style_train_step():
    """Second model family end-to-end: multimodal Swin + MLP decoders
    + DVE head through one jitted train step."""
    import jax.numpy as jnp
    from nicr_mtsa_tpu.tasks import (
        DenseVisualEmbeddingTaskHelper, SemanticTaskHelper as STH,
    )
    from nicr_mtsa_tpu.tasks.dense_visual_embedding import (
        pad_embedding_luts,
    )

    Hs, Ws = 64, 64
    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene',
               'dense_visual_embedding'),
        backbone_rgb=None, backbone_depth=None,
        backbone_rgbd='swin-t',
        context_module='ppm', context_n_channels=64,
        decoder_type='mlp', decoder_n_channels=(64, 48, 48, 48),
        encoder_decoder_fusion='swin-ln-select',
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(Hs, Ws),
        semantic_n_classes=N_CLASSES - 1, scene_n_classes=4,
        embedding_dim=16,
    )
    model = build_model(config)
    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=config.tasks + ('panoptic',),
            semantic_classes_is_thing=IS_THING[1:],
            top_k_instances=16),
        task_helpers={
            'semantic': STH(n_classes=N_CLASSES - 1),
            'instance': InstanceTaskHelper(
                semantic_n_classes=N_CLASSES,
                semantic_classes_is_thing=IS_THING,
                top_k_instances=16),
            'scene': SceneTaskHelper(n_classes=4),
            'dense_visual_embedding':
                DenseVisualEmbeddingTaskHelper(n_classes=N_CLASSES - 1),
        },
    )

    rng = np.random.default_rng(4)
    D = 16
    luts = [rng.normal(size=(3, D)).astype(np.float32),
            rng.normal(size=(2, D)).astype(np.float32)]
    batch = {
        'rgbd': rng.normal(size=(2, Hs, Ws, 4)).astype(np.float32),
        'semantic': rng.integers(0, N_CLASSES, (2, Hs, Ws)).astype(
            np.int32),
        'instance_center': rng.random((2, Hs, Ws)).astype(np.float32),
        'instance_offset': rng.normal(
            size=(2, Hs, Ws, 2)).astype(np.float32),
        'instance_foreground': rng.random((2, Hs, Ws)) > 0.5,
        'instance_center_mask': rng.random((2, Hs, Ws)) > 0.3,
        'orientation': rng.normal(size=(2, Hs, Ws, 2)).astype(np.float32),
        'orientation_foreground': rng.random((2, Hs, Ws)) > 0.5,
        'scene': rng.integers(1, 5, (2,)).astype(np.int32),
        'dense_visual_embedding_lut': jnp.asarray(
            pad_embedding_luts(luts, D)),
        'dense_visual_embedding_indices': jnp.asarray(
            rng.integers(0, 3, (2, Hs, Ws)).astype(np.int32)),
    }
    inputs = pipeline.model_inputs(batch)
    state = pipeline.create_train_state(jax.random.PRNGKey(0), inputs)
    state1, losses = pipeline.train_step(state, batch, batch_idx=0,
                                         rng=jax.random.PRNGKey(1))
    for key in ('semantic_total_loss', 'instance_center_total_loss',
                'dense_visual_embedding_total_loss', 'scene_total_loss',
                'total_loss'):
        assert np.isfinite(float(losses[key])), key
    assert int(state1['step']) == 1


def test_fused_eval_orientation_mae_on_device():
    """With the preprocessing-provided GT angle tables, the fused eval
    step computes the orientation MAE inside the jit."""
    pipeline = make_pipeline()
    batch = make_batch()
    assert 'panoptic_gt_angle_table' in batch
    inputs = pipeline.model_inputs(batch)
    state = pipeline.create_train_state(jax.random.PRNGKey(0), inputs)

    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )
    step = pipeline.make_fused_eval_step(
        {APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY]})
    arrays = strip_non_arrays(batch)
    states = {name: helper.empty_metric_states()
              for name, helper in pipeline.task_helpers.items()
              if hasattr(helper, 'empty_metric_states')}
    _, _, states = step(state['params'], state['batch_stats'], arrays,
                        states)
    assert 'sum_angular_error' in states['panoptic']['pq']
    # random network: counts may be zero, but the state exists/finite
    assert np.isfinite(float(states['panoptic']['pq']['sum_angular_error']))


def test_training_convergence_smoke():
    """Overfit one small batch: total loss must drop substantially --
    the end-to-end gradient path through every task head works."""
    pipeline = make_pipeline()
    batch = make_batch()
    jit_batch = strip_non_arrays(batch)
    inputs = pipeline.model_inputs(batch)

    import optax
    pipeline.optimizer = optax.adam(3e-4)
    state = pipeline.create_train_state(jax.random.PRNGKey(0), inputs)

    first = None
    for i in range(25):
        state, losses = pipeline.train_step(
            state, jit_batch, batch_idx=i, rng=jax.random.PRNGKey(i))
        total = float(losses['total_loss'])
        if first is None:
            first = total
    assert np.isfinite(total)
    assert total < 0.7 * first, (first, total)


def test_training_learns_segmentation():
    """System-level guarantee the reference never had in one test:
    overfitting a fixed batch through the full multi-task train step
    must drive the *evaluation metrics* (fullres mIoU via the semantic
    helper, panoptic-deeplab PQ via merge + device PQ states) to
    near-GT quality -- i.e. gradients, postprocessing, merge, and
    metrics all agree end-to-end. Calibration: mIoU hits 1.0 and PQ
    ~0.57 by step 100 with adam(2e-3); thresholds leave margin.
    (Scene accuracy is excluded: the two samples are the same image
    with different scene labels, so 0.5 is its ceiling.)"""
    import optax

    pipeline = make_pipeline()
    pipeline.optimizer = optax.adam(2e-3)
    batch = make_batch()
    jit_batch = strip_non_arrays(batch)
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(batch))

    for i in range(120):
        state, losses = pipeline.train_step(
            state, jit_batch, batch_idx=i, rng=jax.random.PRNGKey(i))
    assert np.isfinite(float(losses['total_loss']))

    pipeline.validation_step(state, batch, batch_idx=0)
    _, _, logs = pipeline.validation_epoch_end()
    assert float(logs['semantic_miou']) > 0.9, logs['semantic_miou']
    assert float(logs['panoptic_all_deeplab_pq']) > 0.3, \
        logs['panoptic_all_deeplab_pq']


@pytest.mark.parametrize('deferred_mode', [True, 'all', 'bilinear-all'])
def test_deferred_semantic_upsampling_pipeline_equivalence(deferred_mode):
    """A model built with `defer_semantic_prediction_upsampling` in any
    mode (True = fuse last upsample, 'all' = fuse both) must (a) accept
    the standard model's parameter pytree verbatim and (b) reproduce
    the serving-pipeline outputs: integer maps exactly, float scores to
    fp noise. Since round 3 the deferred fallback reduces the
    kernel-exact phase twin (apply_deferred_upsampling_exact) rather
    than re-running the standard conv chain -- guaranteeing
    argmax(softmax) == idx within one dict
    (tests/test_deferred_consistency.py) at the price of ulp-level
    score differences vs the conv path here. On-TPU kernel parity is
    covered by tests/test_ops.py, tests/test_finisher4x.py + hardware
    runs (PERF.md)."""
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    H, W = 32, 64
    n_classes = 8
    is_thing = tuple(i < 3 for i in range(n_classes))

    # 'bilinear-all' = the MLP-decoder families' parameter-free
    # prediction ladder (DeferredBilinear2): both std and deferred
    # models use bilinear prediction upsampling
    bilinear = deferred_mode == 'bilinear-all'
    pred_up = 'bilinear' if bilinear else 'learned-3x3-zeropad'

    def make(deferred):
        if bilinear and deferred:
            deferred = 'all'       # only the two-stage deferral exists
        config = MultiTaskModelConfig(
            tasks=('semantic', 'instance', 'orientation', 'scene'),
            backbone_rgb='resnet18', backbone_depth='resnet18',
            resnet_block='basicblock', context_n_channels=32,
            decoder_n_channels=(16, 12, 8), decoder_n_blocks=1,
            input_size=(H, W), semantic_n_classes=n_classes,
            scene_n_classes=5,
            upsampling='learned-3x3-zeropad',
            prediction_upsampling=pred_up,
            defer_semantic_prediction_upsampling=deferred,
            dtype=jnp.float32)
        model = build_model(config)
        post = PanopticPostprocessing(
            semantic_postprocessing=SemanticPostprocessing(),
            instance_postprocessing=InstancePostprocessing(
                heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
                top_k_instances=8),
            semantic_classes_is_thing=is_thing,
            semantic_class_has_orientation=is_thing)
        return model, PanopticInferencePipeline(
            model, post, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (2, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(
        rng.integers(0, 2 ** 14, (2, H, W), dtype=np.uint16))

    model_std, pipe_std = make(False)
    _, pipe_def = make(deferred_mode)
    inputs = pipe_std.preprocess(rgb, depth)
    variables = jax.jit(
        lambda k: model_std.init({'params': k}, inputs, train=False)
    )(jax.random.PRNGKey(0))

    out_std = pipe_std(variables, rgb, depth)   # shared params
    out_def = pipe_def(variables, rgb, depth)
    assert set(out_std) == set(out_def)
    for key in out_std:
        a = np.asarray(out_std[key])
        b = np.asarray(out_def[key])
        if np.issubdtype(a.dtype, np.integer) or a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=key)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=key)


@pytest.mark.parametrize('deferred_mode', [True, 'all', 'bilinear-all'])
def test_deferred_semantic_train_and_validation_equivalence(deferred_mode):
    """The deferred-upsampling models (last-only and both-fused) must
    train and validate like the standard model: same params, same
    losses (the training path applies the deferred conv(s) before the
    CE loss), same validation logs."""
    bilinear = deferred_mode == 'bilinear-all'
    pred_up = 'bilinear' if bilinear else 'learned-3x3-zeropad'

    def make(deferred):
        if bilinear and deferred:
            deferred = 'all'
        config = MultiTaskModelConfig(
            tasks=('semantic', 'instance', 'orientation', 'scene'),
            backbone_rgb='resnet18', backbone_depth='resnet18',
            resnet_block='basicblock', context_module='ppm',
            context_n_channels=64, input_size=(H, W),
            decoder_n_channels=(32, 24, 16), decoder_n_blocks=1,
            upsampling='learned-3x3-zeropad',
            prediction_upsampling=pred_up,
            defer_semantic_prediction_upsampling=deferred,
            semantic_n_classes=N_CLASSES - 1, scene_n_classes=4)
        model = build_model(config)
        postprocessors = default_postprocessors(
            tasks=config.tasks + ('panoptic',),
            semantic_classes_is_thing=IS_THING[1:], top_k_instances=16)
        task_helpers = {
            'semantic': SemanticTaskHelper(n_classes=N_CLASSES - 1),
            'scene': SceneTaskHelper(n_classes=4),
        }
        return MultiTaskPipeline(model=model,
                                 postprocessors=postprocessors,
                                 task_helpers=task_helpers)

    batch = make_batch()
    jit_batch = strip_non_arrays(batch)
    pipe_std = make(False)
    pipe_def = make(deferred_mode)
    inputs = pipe_std.model_inputs(batch)
    state = pipe_std.create_train_state(jax.random.PRNGKey(0), inputs)

    rng = jax.random.PRNGKey(7)
    _, losses_std = pipe_std.train_step(dict(state), jit_batch, rng=rng)
    _, losses_def = pipe_def.train_step(dict(state), jit_batch, rng=rng)
    for key in losses_std:
        np.testing.assert_allclose(
            np.asarray(losses_std[key]), np.asarray(losses_def[key]),
            rtol=1e-5, err_msg=key)

    preds_std, _, logs_std = pipe_std.validation_step(state, batch)
    preds_def, _, logs_def = pipe_def.validation_step(state, batch)
    np.testing.assert_array_equal(
        np.asarray(preds_std['semantic_segmentation_idx']),
        np.asarray(preds_def['semantic_segmentation_idx']))
    assert set(logs_std) == set(logs_def)


def test_inference_pipeline_multimodal_rgbd_backbone():
    """PanopticInferencePipeline must feed a single 4-channel
    multimodal backbone the concatenated {'rgbd'} input (the
    EMSAFormer serving path)."""
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    Hs, Ws = 64, 64
    n_classes = 6
    is_thing = tuple(i < 2 for i in range(n_classes))
    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'scene'),
        backbone_rgb=None, backbone_depth=None,
        backbone_rgbd='swin-t',
        context_module='ppm', context_n_channels=32,
        decoder_type='mlp', decoder_n_channels=(32, 24, 24, 24),
        encoder_decoder_fusion='swin-ln-select',
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(Hs, Ws), semantic_n_classes=n_classes,
        scene_n_classes=3, dtype=jnp.float32)
    model = build_model(config)
    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=8),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing)
    pipe = PanopticInferencePipeline(model, post,
                                     compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (2, Hs, Ws, 3),
                                   dtype=np.uint8))
    depth = jnp.asarray(rng.integers(0, 2 ** 14, (2, Hs, Ws),
                                     dtype=np.uint16))
    inputs = pipe.preprocess(rgb, depth)
    assert set(inputs) == {'rgbd'}
    assert inputs['rgbd'].shape == (2, Hs, Ws, 4)

    variables = jax.jit(
        lambda k: model.init({'params': k}, inputs, train=False)
    )(jax.random.PRNGKey(0))
    out = pipe(variables, rgb, depth)
    assert out['panoptic'].shape == (2, Hs, Ws)
    assert np.asarray(out['semantic_idx']).max() < n_classes


def test_inference_pipeline_extra_output_tasks():
    """Serving can opt dense heads (normal / DVE) into the output dict;
    by default they stay out so XLA dead-code-eliminates them."""
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    cfg = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'normal',
               'dense_visual_embedding'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=64,
        decoder_n_channels=(32, 24, 16), decoder_n_blocks=1,
        input_size=(64, 96), semantic_n_classes=12, embedding_dim=32)
    model = build_model(cfg)
    is_thing = tuple(i < 4 for i in range(12))
    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=8),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing)
    pipe = PanopticInferencePipeline(
        model, post,
        extra_output_tasks=('normal', 'dense_visual_embedding'))

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (2, 64, 96, 3), dtype=np.uint8))
    depth = jnp.asarray(
        rng.integers(0, 2 ** 14, (2, 64, 96), dtype=np.uint16))
    variables = jax.jit(lambda k: model.init(
        {'params': k}, pipe.preprocess(rgb, depth), train=False)
    )(jax.random.PRNGKey(0))
    out = pipe(variables, rgb, depth)
    assert out['normal_output'].shape == (2, 64, 96, 3)
    # normals are unit length (NormalOutputNormalization)
    norms = np.linalg.norm(np.asarray(
        out['normal_output'], dtype=np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-2)
    assert out['dense_visual_embedding_output'].shape == (2, 64, 96, 32)
