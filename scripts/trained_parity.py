"""Trained-weights, full-resolution accuracy parity (VERDICT r3 #4).

Measures -- not infers -- the cross-framework metric delta with
NON-RANDOM weights at the deployment resolution: train the flagship
EMSANet-class network (2x ResNet-34 NBt1D, 480x640) briefly on a
learnable synthetic directory dataset, then evaluate the SAME weights'
raw outputs through BOTH full stacks:

- this repo's fused jit eval step (postprocessing -> device panoptic
  merge -> device PQ/mIoU metric states), and
- the reference's own torch eval stack imported unmodified from
  /root/reference (PanopticPostprocessing -> CPU deeplab merge ->
  torchmetrics-style PQ/mIoU; reference
  model/postprocessing/panoptic.py:143-152, metric/pq.py:213-296,
  task_helper/semantic.py:110-128),

and prints the per-metric deltas (north star: mIoU/PQ within 0.1).
The torch-side code is shared with tests/test_full_system_parity.py.

    python scripts/trained_parity.py [--steps 150] [--cpu] \
        [--height 480 --width 640] [--report PARITY_RUN.md]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

N_WITH_VOID = 11
THING_IDS = (1, 2, 3)
IS_THING = tuple(i in THING_IDS for i in range(N_WITH_VOID))
TOP_K = 32
N_SCENES = 3                     # without void
EMBED_DIM = 32
M_PER_CAT = 1 << 16


def class_embedding_tables():
    """Deterministic unit class-embedding tables for the DVE retrieval
    heads (text-based and visual-mean-based); shared verbatim by both
    stacks."""
    out = []
    for seed in (11, 12):
        r = np.random.default_rng(seed)
        e = r.normal(size=(N_WITH_VOID - 1, EMBED_DIM)).astype(np.float32)
        out.append(e / np.linalg.norm(e, axis=1, keepdims=True))
    return out


def add_dve_targets(batch, class_embeds):
    """Synthetic per-segment embedding targets in the target
    generator's contract (LUT row j <-> index value j, 0 = void):
    each segment's embedding is its CLASS embedding plus deterministic
    noise, so retrieval mIoU is learnable and non-degenerate."""
    from nicr_mtsa_tpu.tasks.dense_visual_embedding import (
        pad_embedding_luts,
    )
    pan = np.asarray(batch['panoptic'])
    luts, idx_imgs = [], []
    for b in range(pan.shape[0]):
        ids = np.unique(pan[b])
        ids = ids[ids != 0]
        r = np.random.default_rng(1234 + int(ids.sum() % 99991))
        rows, index_img = [], np.zeros(pan[b].shape, np.int32)
        for j, sid in enumerate(ids, start=1):
            cls = int(sid) // M_PER_CAT
            v = class_embeds[cls - 1] \
                + 0.1 * r.normal(size=EMBED_DIM).astype(np.float32)
            rows.append((v / np.linalg.norm(v)).astype(np.float32))
            index_img[pan[b] == sid] = j
        luts.append(np.stack(rows) if rows
                    else np.zeros((0, EMBED_DIM), np.float32))
        idx_imgs.append(index_img)
    batch['dense_visual_embedding_lut'] = pad_embedding_luts(
        luts, EMBED_DIM)
    batch['dense_visual_embedding_indices'] = np.stack(idx_imgs)
    return batch


def make_learnable_dataset(root, full_h, full_w, n_train, n_valid):
    """Directory dataset whose RGB/depth carry the class structure
    (class-colored regions + noise), so a brief training run produces
    non-degenerate predictions."""
    from nicr_mtsa_tpu.data._types import OrientationDict
    from nicr_mtsa_tpu.data.dataset import (
        DatasetConfig, SemanticLabel, SemanticLabelList,
        write_directory_dataset,
    )

    rng = np.random.default_rng(7)
    labels = [SemanticLabel('void')]
    colors = {}
    for i in range(1, N_WITH_VOID):
        color = tuple(int(v) for v in rng.integers(30, 225, 3))
        colors[i] = color
        labels.append(SemanticLabel(
            name=f'class_{i}', is_thing=i in THING_IDS,
            use_orientation=i in THING_IDS, color=color))
    config = DatasetConfig(
        semantic_label_list=SemanticLabelList(labels),
        scene_label_list=('void', 'office', 'kitchen', 'bedroom'),
        depth_mean=8000.0, depth_std=4000.0, depth_mode='raw')

    def make_sample(idx):
        r = np.random.default_rng(9000 + idx)
        H, W = full_h, full_w
        semantic = np.full((H, W), int(r.choice((4, 5, 6))), np.uint8)
        instance = np.zeros((H, W), np.uint16)
        orientations = OrientationDict()
        # a couple of stuff regions
        for _ in range(2):
            bh, bw = int(r.integers(H // 4, H // 2)), \
                int(r.integers(W // 4, W // 2))
            y, x = int(r.integers(0, H - bh)), int(r.integers(0, W - bw))
            semantic[y:y + bh, x:x + bw] = int(r.choice((7, 8, 9, 10)))
        # thing instances
        for i in range(1, int(r.integers(3, 6))):
            bh, bw = int(r.integers(H // 8, H // 4)), \
                int(r.integers(W // 8, W // 4))
            y, x = int(r.integers(0, H - bh)), int(r.integers(0, W - bw))
            cls = int(r.choice(THING_IDS))
            semantic[y:y + bh, x:x + bw] = cls
            instance[y:y + bh, x:x + bw] = i
            orientations[i] = float(r.uniform(0, 2 * np.pi))
        # learnable appearance: class color + noise; depth encodes class
        palette = np.zeros((N_WITH_VOID, 3), np.float32)
        for i, c in colors.items():
            palette[i] = c
        rgb = palette[semantic]
        rgb += r.normal(0, 25, rgb.shape)
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
        depth = (2000 + semantic.astype(np.int32) * 800
                 + r.integers(0, 400, (H, W))).astype(np.uint16)
        # per-class canonical surface normal + noise (learnable from
        # the class-colored appearance); void pixels -> zero vector
        # (invalid, masked by the RMSE like the reference's
        # _get_valid_gt_normals)
        cls_normals = np.stack([
            np.array([np.cos(c * 0.6), np.sin(c * 0.6), 1.0])
            for c in range(N_WITH_VOID)]).astype(np.float32)
        cls_normals /= np.linalg.norm(cls_normals, axis=1,
                                      keepdims=True)
        normal = cls_normals[semantic]
        normal += r.normal(0, 0.05, normal.shape).astype(np.float32)
        normal /= np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
        normal[semantic == 0] = 0.0
        return {'rgb': rgb, 'depth': depth, 'semantic': semantic,
                'instance': instance, 'orientations': orientations,
                'normal': normal.astype(np.float32),
                'scene': 1 + (idx % 3)}

    for split, ids in (('train', range(n_train)),
                       ('valid', range(100, 100 + n_valid))):
        write_directory_dataset(
            root, split, [make_sample(i) for i in ids], config)
    return config


def build_preprocessor(height, width, all_tasks=False):
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, FullResCloner, InstanceClearStuffIDs,
        InstanceTargetGenerator, MultiscaleSupervisionGenerator,
        NormalizeDepth, NormalizeRGB, OrientationTargetGenerator,
        PanopticTargetGenerator, Resize, ToDeviceArrays,
    )
    clone_keys = ('rgb', 'depth', 'semantic', 'instance')
    ms_keys = ('semantic', 'instance')
    stages = [
        InstanceClearStuffIDs(semantic_classes_is_thing=IS_THING),
        FullResCloner(clone_keys + (('normal',) if all_tasks else ())),
        Resize(height=height, width=width),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32),
            keys=ms_keys + (('orientations', 'normal')
                            if all_tasks else ())),
        InstanceTargetGenerator(
            sigma=8, semantic_classes_is_thing=IS_THING,
            sigma_for_additional_downscales={4: 2, 8: 2, 16: 1, 32: 1}),
    ]
    if all_tasks:
        stages.append(OrientationTargetGenerator(
            semantic_classes_estimate_orientation=IS_THING))
    stages += [
        PanopticTargetGenerator(semantic_classes_is_thing=IS_THING),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ]
    return Compose(stages)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=150)
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--eval-batch-size', type=int, default=8)
    parser.add_argument('--height', type=int, default=480)
    parser.add_argument('--width', type=int, default=640)
    parser.add_argument('--full-height', type=int, default=600)
    parser.add_argument('--full-width', type=int, default=800)
    parser.add_argument('--n-train', type=int, default=16)
    parser.add_argument('--n-valid', type=int, default=16)
    parser.add_argument('--tasks', choices=('panoptic', 'all'),
                        default='all',
                        help="'all' adds orientation, scene, normal "
                             'and dense-visual-embedding heads and '
                             'their reference-side metric twins '
                             "(round-5 verdict item 6); 'panoptic' is "
                             'the 4-metric round-4 run')
    parser.add_argument('--small-model', action='store_true',
                        help='resnet18/basicblock thin model (CI-sized)')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--data-root', default='/tmp/parity_dataset')
    parser.add_argument('--report', default='')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from nicr_mtsa_tpu.data import mt_collate
    from nicr_mtsa_tpu.data.dataset import get_dataset
    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.pipeline import (
        MultiTaskPipeline, default_postprocessors, strip_non_arrays,
    )
    from nicr_mtsa_tpu.tasks import (
        DenseVisualEmbeddingTaskHelper, InstanceTaskHelper,
        NormalTaskHelper, PanopticTaskHelper, SceneTaskHelper,
        SemanticTaskHelper,
    )
    from nicr_mtsa_tpu.weighting import FixedLossWeighting

    H, W = args.height, args.width
    all_tasks = args.tasks == 'all'

    print(f'# dataset: {args.n_train}+{args.n_valid} samples, fullres '
          f'{args.full_height}x{args.full_width}, working {H}x{W}, '
          f'tasks={args.tasks}')
    make_learnable_dataset(args.data_root, args.full_height,
                           args.full_width, args.n_train, args.n_valid)
    pre = build_preprocessor(H, W, all_tasks=all_tasks)

    task_tuple = ('semantic', 'instance')
    if all_tasks:
        task_tuple = ('semantic', 'instance', 'orientation', 'scene',
                      'normal', 'dense_visual_embedding')
    if args.small_model:
        config = MultiTaskModelConfig(
            tasks=task_tuple,
            backbone_rgb='resnet18', backbone_depth='resnet18',
            resnet_block='basicblock', context_n_channels=64,
            decoder_n_channels=(64, 48, 32), decoder_n_blocks=1,
            input_size=(H, W), semantic_n_classes=N_WITH_VOID - 1,
            scene_n_classes=N_SCENES, embedding_dim=EMBED_DIM)
    else:
        # the flagship family (2x R34 NBt1D, 512-ch context/decoders)
        config = MultiTaskModelConfig(
            tasks=task_tuple,
            input_size=(H, W), semantic_n_classes=N_WITH_VOID - 1,
            scene_n_classes=N_SCENES, embedding_dim=EMBED_DIM)
    model = build_model(config)

    embeds_text, embeds_vis = class_embedding_tables()
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
    weights = {
        'semantic_total_loss': 1.0,
        'instance_center_total_loss': 1.0,
        'instance_offset_total_loss': 1.0,
    }
    dve_kwargs = {}
    if all_tasks:
        helpers['scene'] = SceneTaskHelper(n_classes=N_SCENES)
        helpers['normal'] = NormalTaskHelper(loss_name='l1')
        helpers['dense_visual_embedding'] = \
            DenseVisualEmbeddingTaskHelper(
                n_classes=N_WITH_VOID - 1,
                # indices are synthesized at full working res only
                disable_multiscale_supervision=True)
        weights.update({
            'instance_orientation_total_loss': 1.0,
            'scene_total_loss': 1.0,
            'normal_total_loss': 1.0,
            'dense_visual_embedding_total_loss': 1.0,
        })
        dve_kwargs = dict(
            with_text_embeddings_per_class=True,
            text_embeddings_per_class=embeds_text,
            with_mean_visual_embedding_per_class=True,
            mean_visual_embedding_per_class=embeds_vis)
    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=task_tuple + ('panoptic',),
            semantic_classes_is_thing=IS_THING[1:],
            top_k_instances=TOP_K, **dve_kwargs),
        task_helpers=helpers,
        loss_weighting=FixedLossWeighting(weights))

    # --- train briefly -----------------------------------------------------
    sample_keys = ('rgb', 'depth', 'semantic', 'instance',
                   'orientations', 'scene') + \
        (('normal',) if all_tasks else ())
    train_ds = get_dataset(args.data_root, split='train',
                           sample_keys=sample_keys)
    train_ds.preprocessor = pre
    train_samples = [train_ds[i] for i in range(len(train_ds))]
    B = args.batch_size

    state = None
    rng = np.random.default_rng(0)
    t0 = time.time()
    for step_i in range(args.steps):
        idx = rng.integers(0, len(train_samples), B)
        batch = mt_collate([train_samples[i] for i in idx])
        if all_tasks:
            add_dve_targets(batch, embeds_text)
        arrays = strip_non_arrays(batch)
        if state is None:
            state = pipeline.create_train_state(
                jax.random.PRNGKey(0), pipeline.model_inputs(arrays))
        state, losses = pipeline.train_step(
            state, arrays, batch_idx=step_i,
            rng=jax.random.PRNGKey(step_i))
        if step_i % 25 == 0 or step_i == args.steps - 1:
            print(f'# step {step_i}: total_loss='
                  f'{float(losses["total_loss"]):.4f} '
                  f'({time.time() - t0:.0f}s)')

    # --- fused eval over the valid split (this repo's stack) ---------------
    valid_ds = get_dataset(args.data_root, split='valid',
                           sample_keys=sample_keys)
    valid_ds.preprocessor = pre
    EB = args.eval_batch_size
    assert len(valid_ds) % EB == 0

    step = None
    states = {n: h.empty_metric_states() for n, h in helpers.items()
              if hasattr(h, 'empty_metric_states')}
    raw_batches = []
    for b0 in range(0, len(valid_ds), EB):
        batch = mt_collate([valid_ds[i] for i in range(b0, b0 + EB)])
        if all_tasks:
            add_dve_targets(batch, embeds_text)
        arrays = strip_non_arrays(batch)
        if step is None:
            static_batch = {APPLIED_PREPROCESSING_KEY:
                            batch[APPLIED_PREPROCESSING_KEY]}
            step = pipeline.make_fused_eval_step(static_batch,
                                                 output_keys=())
        _, _, states = step(state['params'], state['batch_stats'],
                            arrays, states)
        raw_batches.append(batch)

    jax_logs = {}
    for n, h in helpers.items():
        if n in states and hasattr(h, 'load_metric_states'):
            h.load_metric_states(jax.device_get(states[n]))
            _, _, logs = h.validation_epoch_end()
            jax_logs.update({k: float(v) for k, v in logs.items()
                             if np.ndim(v) == 0})

    # --- the reference's own torch eval stack on the same raw outputs ------
    import test_full_system_parity as fsp

    ref = fsp.import_reference()
    fsp.sync_pool_context()
    from nicr_mt_scene_analysis import metric as ref_metric    # noqa
    torch = fsp.torch

    # accumulate reference metrics over the same eval batches
    miou = ref_metric.MeanIntersectionOverUnion(n_classes=N_WITH_VOID - 1)
    if all_tasks:
        pq = ref_metric.PanopticQualityWithOrientationMAE(
            num_categories=N_WITH_VOID, ignored_label=0,
            max_instances_per_category=fsp.M, offset=256 ** 3,
            is_thing=list(IS_THING))
        pq_inst = ref_metric.PanopticQualityWithOrientationMAE(
            num_categories=N_WITH_VOID, ignored_label=0,
            max_instances_per_category=fsp.M, offset=256 ** 3,
            is_thing=list(IS_THING))
        rmse = ref_metric.RootMeanSquaredError()
        miou_text = ref_metric.MeanIntersectionOverUnion(
            n_classes=N_WITH_VOID - 1)
        miou_vis = ref_metric.MeanIntersectionOverUnion(
            n_classes=N_WITH_VOID - 1)
        scene_cm = np.zeros((N_SCENES, N_SCENES), np.int64)
    else:
        pq = ref_metric.PanopticQuality(
            num_categories=N_WITH_VOID, ignored_label=0,
            max_instances_per_category=fsp.M, offset=256 ** 3,
            is_thing=list(IS_THING))
    miou2 = ref_metric.MeanIntersectionOverUnion(
        n_classes=N_WITH_VOID, ignore_first_class=True)
    from nicr_mt_scene_analysis.model.postprocessing import (
        get_postprocessing_class,
    )
    from nicr_mt_scene_analysis.utils.panoptic_merge import (
        deeplab_merge_batch,
    )
    post = get_postprocessing_class('panoptic')(
        semantic_postprocessing=get_postprocessing_class('semantic')(),
        instance_postprocessing=get_postprocessing_class('instance')(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=TOP_K),
        semantic_classes_is_thing=IS_THING[1:],
        semantic_class_has_orientation=IS_THING[1:],
    )
    if all_tasks:
        post_normal = get_postprocessing_class('normal')()
        post_dve = get_postprocessing_class('dense-visual-embedding')(
            with_text_embeddings_per_class=True,
            text_embeddings_per_class=torch.tensor(embeds_text),
            with_mean_visual_embedding_per_class=True,
            mean_visual_embedding_per_class=torch.tensor(embeds_vis))

    def _raw_all(batch):
        arrays = strip_non_arrays(batch)
        out = model.apply(
            {'params': state['params'],
             'batch_stats': state['batch_stats']},
            {'rgb': jnp.asarray(arrays['rgb']),
             'depth': jnp.asarray(arrays['depth'])}, train=False)
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), out)

    t = torch.tensor

    def _chw(x):
        return t(x.transpose(0, 3, 1, 2))

    for batch in raw_batches:
        raw = _raw_all(batch)
        sem_logits = raw['semantic'][0]
        instance_raw = raw['instance'][0]
        center, offset = instance_raw[0], instance_raw[1]
        batch_t = {
            APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
            'instance_foreground':
                t(np.asarray(batch['instance_foreground'])),
            'rgb_fullres': t(np.asarray(batch['rgb_fullres'])
                             .transpose(0, 3, 1, 2)),
        }
        if all_tasks:
            batch_t['orientation_foreground'] = \
                t(np.asarray(batch['orientation_foreground']))
            i_raw = (_chw(center), _chw(offset), _chw(instance_raw[2]))
        else:
            i_raw = (_chw(center), _chw(offset))
        data = ((_chw(sem_logits), i_raw), (None, None))
        with torch.no_grad():
            result = post.postprocess(data, batch_t, is_training=False)
        gt_sem = t(np.asarray(batch['semantic_fullres']).astype(np.int64))
        mask = gt_sem != 0
        miou.update(preds=result['semantic_segmentation_idx_fullres'][mask],
                    target=gt_sem[mask] - 1)
        pan_pred = result['panoptic_segmentation_deeplab_fullres'] \
            .to(torch.int64).cpu()
        pan_gt = t(np.asarray(batch['panoptic_fullres']).astype(np.int64))
        if all_tasks:
            # orientation-aware PQ exactly as the reference panoptic
            # task helper wires it (ref task_helper/panoptic.py:86-119)
            pq.update(
                panoptic_preds=pan_pred,
                orientation_preds=result[
                    'orientations_panoptic_segmentation_deeplab_instance'],
                panoptic_preds_id_dicts=result[
                    'panoptic_segmentation_deeplab_ids'],
                panoptic_target=pan_gt,
                orientation_target=batch['orientations_present'],
                panoptic_target_id_dicts=batch[
                    'panoptic_ids_to_instance_dict_fullres'])

            # instance-branch PQ: merge predicted instances with the
            # GT semantic (ref task_helper/instance.py:320-358)
            inst_pred = result[
                'instance_segmentation_gt_foreground_fullres'].cpu()
            inst_gt = t(np.asarray(batch['instance_fullres'])
                        .astype(np.int64))
            merged, merged_ids = deeplab_merge_batch(
                gt_sem.cpu(), inst_pred, inst_gt != 0, fsp.M,
                THING_IDS, 0)
            pq_inst.update(
                panoptic_preds=merged.cpu(),
                orientation_preds=result[
                    'orientations_instance_segmentation'
                    '_gt_orientation_foreground'],
                panoptic_preds_id_dicts=merged_ids,
                panoptic_target=pan_gt,
                orientation_target=batch['orientations_present'],
                panoptic_target_id_dicts=batch[
                    'panoptic_ids_to_instance_dict_fullres'])

            # scene: softmax/argmax + confusion (ref task_helper/
            # scene.py:100-126)
            scene_idx = np.argmax(raw['scene'][0], axis=-1)
            scene_gt = np.asarray(batch['scene']).astype(np.int64)
            for p, g in zip(scene_idx[scene_gt != 0],
                            scene_gt[scene_gt != 0] - 1):
                scene_cm[g, p] += 1

            # normal: ref postprocessing (fullres nearest) + ref RMSE
            # masked to valid GT normals (ref task_helper/normal.py)
            with torch.no_grad():
                nres = post_normal.postprocess(
                    (_chw(raw['normal'][0]), (None,)), batch_t,
                    is_training=False)
            gt_normal = t(np.asarray(batch['normal_fullres'])
                          .astype(np.float32).transpose(0, 3, 1, 2))
            nmask = ~((gt_normal[:, 0] == 0) & (gt_normal[:, 1] == 0)
                      & (gt_normal[:, 2] == 0))
            rmse.update(preds=nres['normal_output_fullres'],
                        target=gt_normal, mask=nmask)

            # DVE: ref retrieval postprocessing + mIoU (ref
            # task_helper/dense_visual_embedding.py validation)
            with torch.no_grad():
                dres = post_dve.postprocess(
                    (_chw(raw['dense_visual_embedding'][0]), (None,)),
                    batch_t, is_training=False)
            for metric, key in (
                    (miou_text, 'dense_visual_embedding_text_based'
                                '_semantic_idx_fullres'),
                    (miou_vis, 'dense_visual_embedding_visual_mean'
                               '_based_semantic_idx_fullres')):
                metric.update(preds=dres[key][mask],
                              target=gt_sem[mask] - 1)
        else:
            pq.update(pan_pred, pan_gt)
        miou2.update(preds=pan_pred // fsp.M, target=gt_sem)

    ref_logs = {'semantic_miou': float(miou.compute()),
                'panoptic_deeplab_semantic_miou': float(miou2.compute())}
    for k, v in pq.compute().items():
        if np.ndim(v) == 0:
            ref_logs[f'panoptic_{k}_deeplab'] = float(v)
    if all_tasks:
        for k, v in pq_inst.compute(suffix='_deeplab').items():
            if hasattr(v, 'numel') and v.numel() == 1 or np.ndim(v) == 0:
                ref_logs[f'instance_{k}'] = float(v)
        tp = np.diag(scene_cm).astype(np.float64)
        gt_n = scene_cm.sum(axis=1).astype(np.float64)
        nz = gt_n != 0
        ref_logs['scene_acc'] = float(tp[nz].sum() / gt_n[nz].sum())
        ref_logs['scene_bacc'] = float(np.mean(tp[nz] / gt_n[nz]))
        ref_logs['normal_rmse'] = float(rmse.compute())
        ref_logs['dense_visual_embedding_text_miou'] = \
            float(miou_text.compute())
        ref_logs['dense_visual_embedding_visual_mean_miou'] = \
            float(miou_vis.compute())

    # --- report ------------------------------------------------------------
    pairs = [('semantic_miou', 'semantic_miou'),
             ('panoptic_deeplab_semantic_miou',
              'panoptic_deeplab_semantic_miou')]
    for grp in ('all', 'things', 'stuff'):
        for m in ('pq', 'sq', 'rq'):
            pairs.append((f'panoptic_{grp}_{m}_deeplab',
                          f'panoptic_{grp}_deeplab_{m}'))
    if all_tasks:
        pairs += [
            ('panoptic_mae_rad_deeplab', 'panoptic_mae_deeplab_rad'),
            ('panoptic_mae_deg_deeplab', 'panoptic_mae_deeplab_deg'),
            ('instance_mae_deeplab_rad', 'instance_mae_deeplab_rad'),
            ('instance_mae_deeplab_deg', 'instance_mae_deeplab_deg'),
            ('scene_acc', 'scene_acc'),
            ('scene_bacc', 'scene_bacc'),
            ('normal_rmse', 'normal_rmse'),
            ('dense_visual_embedding_text_miou',
             'dense_visual_embedding_text_miou'),
            ('dense_visual_embedding_visual_mean_miou',
             'dense_visual_embedding_visual_mean_miou'),
        ]
        for grp in ('all', 'things'):
            for m in ('pq', 'sq', 'rq'):
                pairs.append((f'instance_{grp}_deeplab_{m}',
                              f'instance_{grp}_deeplab_{m}'))

    lines = [f'| metric | reference (torch) | this repo (fused) | delta |',
             f'|---|---|---|---|']
    worst = 0.0
    for ref_key, jax_key in pairs:
        r, j = ref_logs.get(ref_key), jax_logs.get(jax_key)
        if r is None or j is None:
            continue
        d = abs(r - j)
        if not ref_key.endswith('_deg'):
            # the 0.1 bar is for unit-interval metrics; degree-valued
            # MAE is the _rad twin times 57.3 (reported, not scored)
            worst = max(worst, d)
        lines.append(f'| {ref_key} | {r:.6f} | {j:.6f} | {d:.2e} |')
    report = '\n'.join(lines)
    print(report)
    print(f'# worst unit-scale |delta| = {worst:.3e} '
          f'({"within" if worst <= 0.1 else "EXCEEDS"} the 0.1 bar)')
    if args.report:
        with open(args.report, 'w') as f:
            f.write(report + f'\n\nworst |delta| = {worst:.3e}\n')


if __name__ == '__main__':
    main()
