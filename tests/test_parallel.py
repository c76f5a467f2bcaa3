"""Mesh / sharding unit tests (SURVEY.md §2.8: the reference delegates
DP to an external DDP/NCCL trainer; here it's first-class via
jax.sharding). Runs on the 8-device virtual CPU mesh from conftest."""
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nicr_mtsa_tpu.parallel import make_mesh, replicate, shard_batch
from nicr_mtsa_tpu.parallel.mesh import batch_sharding, replicated


def test_make_mesh_shape_and_axes():
    mesh = make_mesh(8)
    assert mesh.shape == {'data': 8}
    mesh2 = make_mesh(4, axis_names=('data', 'model'), mesh_shape=(2, 2))
    assert mesh2.shape == {'data': 2, 'model': 2}


def test_shard_batch_and_replicate_placement():
    mesh = make_mesh(8)
    batch = {'rgb': np.zeros((8, 4, 4, 3), np.float32),
             'nested': {'scene': np.zeros((8,), np.int32)}}
    sharded = shard_batch(batch, mesh)
    assert sharded['rgb'].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=4)
    assert sharded['nested']['scene'].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=1)
    # each shard holds 1 of the 8 rows
    shard0 = sharded['rgb'].addressable_shards[0]
    assert shard0.data.shape == (1, 4, 4, 3)

    params = {'w': np.ones((3, 3), np.float32)}
    repl = replicate(params, mesh)
    assert repl['w'].sharding.is_equivalent_to(replicated(mesh), ndim=2)
    assert repl['w'].addressable_shards[0].data.shape == (3, 3)


def test_sharded_sum_matches_single_device():
    """A jitted reduction over a data-sharded array must equal the
    unsharded result (XLA inserts the cross-device psum)."""
    mesh = make_mesh(8)
    x = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    xs = jax.device_put(x, batch_sharding(mesh))

    f = jax.jit(lambda a: jnp.sum(a * a),
                in_shardings=batch_sharding(mesh),
                out_shardings=replicated(mesh))
    np.testing.assert_allclose(float(f(xs)), float(np.sum(x * x)),
                               rtol=1e-6)


def test_dryrun_multichip_four_devices():
    """The driver's multi-chip dryrun on a 4-device sub-mesh: full
    train step (forward, losses, grads, update) with sharded batch."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(4)


def test_sharded_eval_forward_matches_unsharded():
    """Forward + postprocessing sharded over 4 devices == the
    single-device result (postprocessing is per-image, so the data
    sharding must not change anything)."""
    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.parallel.train import make_sharded_eval_forward
    from nicr_mtsa_tpu.pipeline import (
        MultiTaskPipeline, default_postprocessors,
    )
    from nicr_mtsa_tpu.tasks import SceneTaskHelper, SemanticTaskHelper

    H, W = 32, 32
    config = MultiTaskModelConfig(
        tasks=('semantic', 'scene'),
        backbone_rgbd='resnet18', backbone_rgb=None, backbone_depth=None,
        resnet_block='basicblock',
        context_n_channels=32,
        decoder_n_channels=(16, 16, 16), decoder_n_blocks=1,
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(H, W), semantic_n_classes=4, scene_n_classes=3,
    )
    model = build_model(config)
    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=config.tasks,
            semantic_classes_is_thing=(True, True, False, False)),
        task_helpers={
            'semantic': SemanticTaskHelper(n_classes=4),
            'scene': SceneTaskHelper(n_classes=3),
        },
    )

    rng = np.random.default_rng(3)
    B = 4
    batch = {
        'rgbd': jnp.asarray(rng.normal(size=(B, H, W, 4)), jnp.float32),
        'rgb_fullres': jnp.asarray(
            rng.integers(0, 255, (B, H, W, 3)), jnp.uint8),
    }
    static_batch = {
        APPLIED_PREPROCESSING_KEY: [[{
            'type': 'Resize',
            'valid_region_slice_y': slice(0, H),
            'valid_region_slice_x': slice(0, W),
        }]],
    }

    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(batch))

    # unsharded reference
    full = dict(batch)
    full.update(static_batch)
    ref = pipeline._val_forward_impl(
        state['params'], state['batch_stats'], full)

    mesh = make_mesh(4)
    fwd = make_sharded_eval_forward(pipeline, mesh,
                                    static_batch=static_batch)
    out = fwd(replicate(state, mesh)['params'],
              replicate(state, mesh)['batch_stats'],
              shard_batch(batch, mesh))

    ref_sem = np.asarray(ref['semantic_segmentation_idx'])
    out_sem = np.asarray(out['semantic_segmentation_idx'])
    np.testing.assert_array_equal(out_sem, ref_sem)
    np.testing.assert_allclose(
        np.asarray(out['scene_class_score']),
        np.asarray(ref['scene_class_score']), rtol=1e-5)
    assert out['semantic_segmentation_idx'].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=3)


def test_sharded_inference_matches_single_device():
    """Data-parallel serving (make_sharded_infer) must reproduce the
    single-device PanopticInferencePipeline outputs exactly."""
    import numpy as np
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.parallel.mesh import make_mesh
    from nicr_mtsa_tpu.parallel.train import make_sharded_infer
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    H, W = 32, 64
    n_classes = 6
    is_thing = tuple(i < 2 for i in range(n_classes))
    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=32,
        decoder_n_channels=(16, 12, 8), decoder_n_blocks=1,
        input_size=(H, W), semantic_n_classes=n_classes,
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
    B = 8    # one image per virtual device
    rgb = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(
        rng.integers(0, 2 ** 14, (B, H, W), dtype=np.uint16))
    variables = jax.jit(
        lambda k: model.init(
            {'params': k}, pipe.preprocess(rgb, depth), train=False)
    )(jax.random.PRNGKey(0))

    single = pipe(variables, rgb, depth)

    mesh = make_mesh(8, ('data',))
    infer = make_sharded_infer(pipe, mesh)
    sharded = infer(variables, rgb, depth)

    assert set(single) == set(sharded)
    for key in single:
        a, b = np.asarray(single[key]), np.asarray(sharded[key])
        if a.dtype.kind in 'iub':
            np.testing.assert_array_equal(a, b, err_msg=key)
        else:
            # float outputs: partitioned programs fuse/accumulate in a
            # different order (1-ulp-scale differences on CPU)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=key)


def test_step_checkpoint_manager_roundtrip(tmp_path):
    import numpy as np
    from nicr_mtsa_tpu.parallel.checkpoint import StepCheckpointManager

    mgr = StepCheckpointManager(str(tmp_path / 'ckpts'), max_to_keep=2)
    assert mgr.latest_step() is None
    state0, _ = mgr.restore()
    assert state0 is None

    for step in (1, 2, 3):
        state = {'params': {'w': jnp.full((4,), float(step))},
                 'step': jnp.asarray(step)}
        mgr.save(step, state, extra={'epoch': step * 10})
    mgr.wait_until_finished()

    assert mgr.latest_step() == 3
    state, extra = mgr.restore()
    np.testing.assert_array_equal(np.asarray(state['params']['w']),
                                  np.full((4,), 3.0))
    assert int(np.asarray(state['step'])) == 3
    assert extra == {'epoch': 30}

    # retention: keep-last-2 means step 1 is gone (orbax) or at least
    # steps 2 and 3 remain restorable
    state2, extra2 = mgr.restore(2)
    assert int(np.asarray(state2['step'])) == 2
    assert extra2 == {'epoch': 20}


def test_step_checkpoint_restores_optax_structure(tmp_path):
    """Restoring with `target` must rebuild optax NamedTuple optimizer
    states (orbax deserializes unknown nodes as plain dicts, which
    breaks optimizer.update on resume)."""
    import numpy as np
    import optax
    from nicr_mtsa_tpu.parallel.checkpoint import StepCheckpointManager

    params = {'w': jnp.ones((3,))}
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    state = {'params': params, 'opt_state': opt_state}

    mgr = StepCheckpointManager(str(tmp_path / 'ck'))
    mgr.save(5, state)
    mgr.wait_until_finished()

    restored, _ = mgr.restore(target=state)
    # the restored opt_state must drive an optimizer update directly
    grads = {'w': jnp.full((3,), 0.1)}
    updates, _ = opt.update(
        jax.tree_util.tree_map(jnp.asarray, grads),
        jax.tree_util.tree_map(jnp.asarray, restored['opt_state']),
        jax.tree_util.tree_map(jnp.asarray, restored['params']))
    new_params = optax.apply_updates(restored['params'], updates)
    assert np.isfinite(np.asarray(new_params['w'])).all()


def test_sharded_fused_eval_step_matches_single_device():
    """The full fused eval (forward + postprocessing + losses + metric
    states) over a 4-device mesh must reproduce the single-device
    `make_fused_eval_step` run: identical predictions, losses, and —
    the dist_reduce_fx='sum' replacement — identical PQ/mIoU/confusion
    states after the shard_map psum_state all-reduce."""
    from test_pipeline import make_batch, make_pipeline

    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )
    from nicr_mtsa_tpu.parallel.train import make_sharded_eval_step
    from nicr_mtsa_tpu.pipeline import strip_non_arrays

    pipeline = make_pipeline()
    batch = make_batch(batch_size=4)
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(batch))

    static_batch = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
    }
    arrays = strip_non_arrays(batch)
    empty = {name: helper.empty_metric_states()
             for name, helper in pipeline.task_helpers.items()
             if hasattr(helper, 'empty_metric_states')}

    # single-device reference, two accumulating steps
    ref_step = pipeline.make_fused_eval_step(static_batch)
    _, ref_losses, ref_states = ref_step(
        state['params'], state['batch_stats'], arrays, empty)
    _, ref_losses, ref_states = ref_step(
        state['params'], state['batch_stats'], arrays, ref_states)

    mesh = make_mesh(4)
    step = make_sharded_eval_step(pipeline, mesh,
                                  static_batch=static_batch)
    sharded_state = replicate(
        {'params': state['params'], 'batch_stats': state['batch_stats']},
        mesh)
    sharded_batch = shard_batch(arrays, mesh)
    sharded_empty = replicate(empty, mesh)

    preds, losses, states = step(
        sharded_state['params'], sharded_state['batch_stats'],
        sharded_batch, sharded_empty)
    preds, losses, states = step(
        sharded_state['params'], sharded_state['batch_stats'],
        sharded_batch, states)

    # predictions stay data-sharded; losses replicated and equal
    assert preds['semantic_segmentation_idx'].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=3)
    for key, ref_v in ref_losses.items():
        np.testing.assert_allclose(float(losses[key]), float(ref_v),
                                   rtol=1e-5, err_msg=key)

    # metric states: exact for integer counts, tight for float sums
    flat_ref, treedef_ref = jax.tree_util.tree_flatten(ref_states)
    flat, treedef = jax.tree_util.tree_flatten(states)
    assert treedef == treedef_ref
    for a, b in zip(flat, flat_ref):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    # PQ/mIoU computed from the reduced states are well-formed
    pipeline.task_helpers['panoptic'].load_metric_states(
        states['panoptic'])
    pipeline.task_helpers['semantic']._metric_iou.state = \
        states['semantic']
    pipeline.task_helpers['scene']._cm_state = states['scene']
    _, _, logs = pipeline.validation_epoch_end()
    assert 0.0 <= float(logs['panoptic_all_deeplab_pq']) <= 1.0
    assert 'semantic_miou' in logs


def test_restore_namedtuple_field_order(tmp_path):
    """Restoring into a NamedTuple whose fields are NOT alphabetical
    must match by field name, not flat leaf order (orbax returns plain
    dicts, which flatten sorted — order-based unflattening would swap
    the leaves silently when shapes coincide)."""
    import collections
    from nicr_mtsa_tpu.parallel.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    Weird = collections.namedtuple('Weird', ['nu', 'mu'])  # not sorted
    state = {'opt': Weird(nu=jnp.full((3,), 7.0), mu=jnp.full((3,), 2.0))}
    path = str(tmp_path / 'ck')
    save_checkpoint(path, state)

    restored, _ = load_checkpoint(path, target=state)
    assert isinstance(restored['opt'], Weird)
    np.testing.assert_array_equal(np.asarray(restored['opt'].nu),
                                  np.full((3,), 7.0))
    np.testing.assert_array_equal(np.asarray(restored['opt'].mu),
                                  np.full((3,), 2.0))


def test_restore_shape_mismatch_raises(tmp_path):
    from nicr_mtsa_tpu.parallel.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    state = {'w': jnp.zeros((3,))}
    path = str(tmp_path / 'ck')
    save_checkpoint(path, state)
    import pytest as _pytest
    with _pytest.raises(ValueError, match='shape/dtype'):
        load_checkpoint(path, target={'w': jnp.zeros((4,))})


def test_fallback_retention_prunes_old_steps(tmp_path):
    """keep-last-N must hold in the no-orbax fallback path too."""
    from nicr_mtsa_tpu.parallel.checkpoint import StepCheckpointManager

    mgr = StepCheckpointManager(str(tmp_path / 'ck'), max_to_keep=2)
    mgr._manager = None    # force the fallback path
    state = {'w': jnp.ones((2,))}
    for step in (1, 2, 3, 4):
        mgr.save(step, state, extra={'epoch': step})

    names = sorted(os.listdir(str(tmp_path / 'ck')))
    steps = {int(n.split('.')[0][5:]) for n in names
             if n.split('.')[0].startswith('step_')}
    assert steps == {3, 4}, names
    assert mgr.latest_step() == 4
    restored, extra = mgr.restore(target=state)
    assert extra['epoch'] == 4


def test_spatial_infer_matches_single_device():
    """Row-sharded (spatial-partitioned) single-image inference must
    reproduce the unsharded forward exactly: XLA inserts the conv halo
    exchanges and turns the PPM global pools into cross-shard psums."""
    from jax.sharding import NamedSharding
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.parallel.train import make_spatial_infer
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    H, W, n_classes = 256, 64, 12   # H/32 = 8 rows: one per shard
    config = MultiTaskModelConfig(
        tasks=('semantic',),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=32,
        decoder_n_channels=(16, 16, 16), decoder_n_blocks=1,
        input_size=(H, W), semantic_n_classes=n_classes)
    model = build_model(config)
    is_thing = tuple(i < 4 for i in range(n_classes))
    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=8),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing)
    pipe = PanopticInferencePipeline(model, post)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(
        rng.integers(0, 2 ** 14, (1, H, W), dtype=np.uint16))
    variables = jax.jit(
        lambda k: model.init({'params': k}, pipe.preprocess(rgb, depth),
                             train=False))(jax.random.PRNGKey(0))

    mesh = make_mesh(8, ('space',))
    infer = make_spatial_infer(pipe, mesh)
    out = infer(variables, rgb, depth)
    assert out['semantic_segmentation_idx'].sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, 'space')), ndim=3)

    def single(variables, rgb, depth):
        from nicr_mtsa_tpu.ops.pallas.semantic_reduce import (
            semantic_score_idx,
        )
        preds = model.apply(
            variables, pipe.preprocess(rgb, depth), train=False)
        return semantic_score_idx(preds['semantic'][0])

    score_ref, idx_ref = jax.jit(single)(variables, rgb, depth)
    np.testing.assert_array_equal(
        np.asarray(out['semantic_segmentation_idx']), np.asarray(idx_ref))
    # scores agree to reduction-reassociation tolerance (the psum
    # splits the float sums differently across shards); idx is exact
    np.testing.assert_allclose(
        np.asarray(out['semantic_segmentation_score']),
        np.asarray(score_ref), rtol=1e-4, atol=1e-4)


def test_tensor_parallel_swin_matches_replicated():
    """('data', 'model') 2D mesh: Megatron-style column/row sharding of
    the Swin MLP pairs must reproduce the replicated forward (XLA
    inserts the per-block psum) -- and the hidden-layer kernels must
    actually be distributed, not replicated."""
    from jax.sharding import NamedSharding
    from nicr_mtsa_tpu.models.backbones.swin import SwinBackbone
    from nicr_mtsa_tpu.parallel.tp import (
        make_2d_mesh, shard_params_for_tp, tp_shardings,
    )

    bb = SwinBackbone(embed_dim=32, depths=(1, 1, 1, 1),
                      n_heads=(2, 4, 8, 16), window_size=8,
                      stochastic_depth=0.0, attn_backend='xla',
                      ln_backend='xla')
    rng = np.random.default_rng(0)
    x = np.random.default_rng(0).normal(size=(4, 64, 64, 3)) \
        .astype(np.float32)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = bb.apply(variables, jnp.asarray(x), train=False)

    mesh = make_2d_mesh(2, 4)
    params_tp = shard_params_for_tp(variables['params'], mesh)
    # fc1 kernels are split over 'model' (hidden = 4C = 128 on stage 1)
    fc1 = params_tp['layer1_block0']['mlp_fc1']['kernel']
    assert fc1.sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, 'model')), ndim=2)
    assert fc1.addressable_shards[0].data.shape[1] == fc1.shape[1] // 4

    xb = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P('data')))
    fwd = jax.jit(lambda p, a: bb.apply({'params': p}, a, train=False),
                  in_shardings=(tp_shardings(variables['params'], mesh),
                                NamedSharding(mesh, P('data'))))
    out = fwd(params_tp, xb)
    for i, (got, want) in enumerate(zip(out, ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f'stage {i}')


def test_multi_slice_eval_and_train_match_single_device():
    """Multi-slice DP simulation (SURVEY.md §2.8): a 2D ('slice',
    'data') mesh stands in for 2 pod slices x 4 chips. The batch is
    sharded jointly over BOTH axes, so gradient all-reduces and the
    metric-state `psum_state` span the slice axis (DCN in a real
    multi-slice deployment) as well as the intra-slice axis (ICI) --
    with no code change, because every parallel helper takes the axis
    spec verbatim. Results must match the single-device fused step."""
    from test_pipeline import make_batch, make_pipeline

    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )
    from nicr_mtsa_tpu.parallel.train import (
        make_sharded_eval_step, make_sharded_train_step,
    )
    from nicr_mtsa_tpu.pipeline import strip_non_arrays

    axes = ('slice', 'data')
    mesh = make_mesh(8, axis_names=axes, mesh_shape=(2, 4))

    pipeline = make_pipeline()
    batch = make_batch(batch_size=8)
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(batch))

    static_batch = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
    }
    arrays = strip_non_arrays(batch)
    empty = {name: helper.empty_metric_states()
             for name, helper in pipeline.task_helpers.items()
             if hasattr(helper, 'empty_metric_states')}

    ref_step = pipeline.make_fused_eval_step(static_batch)
    _, ref_losses, ref_states = ref_step(
        state['params'], state['batch_stats'], arrays, empty)

    step = make_sharded_eval_step(pipeline, mesh,
                                  static_batch=static_batch,
                                  axis_name=axes)
    sharded_state = replicate(
        {'params': state['params'], 'batch_stats': state['batch_stats']},
        mesh)
    sharded_batch = shard_batch(arrays, mesh, axis_name=axes)
    preds, losses, states = step(
        sharded_state['params'], sharded_state['batch_stats'],
        sharded_batch, replicate(empty, mesh))

    assert preds['semantic_segmentation_idx'].sharding.is_equivalent_to(
        batch_sharding(mesh, axes), ndim=3)
    for key, ref_v in ref_losses.items():
        np.testing.assert_allclose(float(losses[key]), float(ref_v),
                                   rtol=1e-5, err_msg=key)
    flat_ref, treedef_ref = jax.tree_util.tree_flatten(ref_states)
    flat, treedef = jax.tree_util.tree_flatten(states)
    assert treedef == treedef_ref
    for a, b in zip(flat, flat_ref):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    # one train step across both mesh axes: losses equal the
    # single-device jitted train-step impl on the same batch
    rng = jax.random.PRNGKey(3)
    _, ref_tr_losses = pipeline._jit_train_step(
        dict(state), arrays, None, rng)
    tr_step = make_sharded_train_step(pipeline, mesh, axis_name=axes,
                                      donate_state=False)
    tr_state = replicate(dict(state), mesh)
    _, tr_losses = tr_step(tr_state, sharded_batch, None, rng)
    # rtol: the 8-way shard splits each per-example loss mean into
    # partial means + psum, so f32 reduction order differs from the
    # single-device sum (observed up to ~2e-4 relative on the von
    # Mises orientation loss).
    for key, ref_v in ref_tr_losses.items():
        np.testing.assert_allclose(float(tr_losses[key]), float(ref_v),
                                   rtol=1e-3, err_msg=key)
