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
        return {'rgb': rgb, 'depth': depth, 'semantic': semantic,
                'instance': instance, 'orientations': orientations,
                'scene': 1 + (idx % 3)}

    for split, ids in (('train', range(n_train)),
                       ('valid', range(100, 100 + n_valid))):
        write_directory_dataset(
            root, split, [make_sample(i) for i in ids], config)
    return config


def build_preprocessor(height, width):
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, FullResCloner, InstanceClearStuffIDs,
        InstanceTargetGenerator, MultiscaleSupervisionGenerator,
        NormalizeDepth, NormalizeRGB, PanopticTargetGenerator,
        Resize, ToDeviceArrays,
    )
    return Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=IS_THING),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=height, width=width),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32), keys=('semantic', 'instance')),
        InstanceTargetGenerator(
            sigma=8, semantic_classes_is_thing=IS_THING,
            sigma_for_additional_downscales={4: 2, 8: 2, 16: 1, 32: 1}),
        PanopticTargetGenerator(semantic_classes_is_thing=IS_THING),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])


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
        InstanceTaskHelper, PanopticTaskHelper, SemanticTaskHelper,
    )
    from nicr_mtsa_tpu.weighting import FixedLossWeighting

    H, W = args.height, args.width

    print(f'# dataset: {args.n_train}+{args.n_valid} samples, fullres '
          f'{args.full_height}x{args.full_width}, working {H}x{W}')
    make_learnable_dataset(args.data_root, args.full_height,
                           args.full_width, args.n_train, args.n_valid)
    pre = build_preprocessor(H, W)

    if args.small_model:
        config = MultiTaskModelConfig(
            tasks=('semantic', 'instance'),
            backbone_rgb='resnet18', backbone_depth='resnet18',
            resnet_block='basicblock', context_n_channels=64,
            decoder_n_channels=(64, 48, 32), decoder_n_blocks=1,
            input_size=(H, W), semantic_n_classes=N_WITH_VOID - 1)
    else:
        # the flagship family (2x R34 NBt1D, 512-ch context/decoders)
        config = MultiTaskModelConfig(
            tasks=('semantic', 'instance'),
            input_size=(H, W), semantic_n_classes=N_WITH_VOID - 1)
    model = build_model(config)

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
    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=('semantic', 'instance', 'panoptic'),
            semantic_classes_is_thing=IS_THING[1:],
            top_k_instances=TOP_K),
        task_helpers=helpers,
        loss_weighting=FixedLossWeighting({
            'semantic_total_loss': 1.0,
            'instance_center_total_loss': 1.0,
            'instance_offset_total_loss': 1.0,
        }))

    # --- train briefly -----------------------------------------------------
    train_ds = get_dataset(args.data_root, split='train')
    train_ds.preprocessor = pre
    train_samples = [train_ds[i] for i in range(len(train_ds))]
    B = args.batch_size

    state = None
    rng = np.random.default_rng(0)
    t0 = time.time()
    for step_i in range(args.steps):
        idx = rng.integers(0, len(train_samples), B)
        batch = mt_collate([train_samples[i] for i in idx])
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
    valid_ds = get_dataset(args.data_root, split='valid')
    valid_ds.preprocessor = pre
    EB = args.eval_batch_size
    assert len(valid_ds) % EB == 0

    step = None
    states = {n: h.empty_metric_states() for n, h in helpers.items()
              if hasattr(h, 'empty_metric_states')}
    raw_batches = []
    for b0 in range(0, len(valid_ds), EB):
        batch = mt_collate([valid_ds[i] for i in range(b0, b0 + EB)])
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
    pq = ref_metric.PanopticQuality(
        num_categories=N_WITH_VOID, ignored_label=0,
        max_instances_per_category=fsp.M, offset=256 ** 3,
        is_thing=list(IS_THING))
    miou2 = ref_metric.MeanIntersectionOverUnion(
        n_classes=N_WITH_VOID, ignore_first_class=True)
    from nicr_mt_scene_analysis.model.postprocessing import (
        get_postprocessing_class,
    )
    post = get_postprocessing_class('panoptic')(
        semantic_postprocessing=get_postprocessing_class('semantic')(),
        instance_postprocessing=get_postprocessing_class('instance')(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=TOP_K),
        semantic_classes_is_thing=IS_THING[1:],
        semantic_class_has_orientation=IS_THING[1:],
    )
    t = torch.tensor
    for batch in raw_batches:
        sem_logits, center, offset = fsp._raw_outputs(
            model, state, batch)
        batch_t = {
            APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
            'instance_foreground':
                t(np.asarray(batch['instance_foreground'])),
            'rgb_fullres': t(np.asarray(batch['rgb_fullres'])
                             .transpose(0, 3, 1, 2)),
        }
        data = ((t(sem_logits.transpose(0, 3, 1, 2)),
                 (t(center.transpose(0, 3, 1, 2)),
                  t(offset.transpose(0, 3, 1, 2)))), (None, None))
        with torch.no_grad():
            result = post.postprocess(data, batch_t, is_training=False)
        gt_sem = t(np.asarray(batch['semantic_fullres']).astype(np.int64))
        mask = gt_sem != 0
        miou.update(preds=result['semantic_segmentation_idx_fullres'][mask],
                    target=gt_sem[mask] - 1)
        pan_pred = result['panoptic_segmentation_deeplab_fullres'] \
            .to(torch.int64).cpu()
        pan_gt = t(np.asarray(batch['panoptic_fullres']).astype(np.int64))
        pq.update(pan_pred, pan_gt)
        miou2.update(preds=pan_pred // fsp.M, target=gt_sem)

    ref_logs = {'semantic_miou': float(miou.compute()),
                'panoptic_deeplab_semantic_miou': float(miou2.compute())}
    for k, v in pq.compute().items():
        if np.ndim(v) == 0:
            ref_logs[f'panoptic_{k}_deeplab'] = float(v)

    # --- report ------------------------------------------------------------
    pairs = [('semantic_miou', 'semantic_miou'),
             ('panoptic_deeplab_semantic_miou',
              'panoptic_deeplab_semantic_miou')]
    for grp in ('all', 'things', 'stuff'):
        for m in ('pq', 'sq', 'rq'):
            pairs.append((f'panoptic_{grp}_{m}_deeplab',
                          f'panoptic_{grp}_deeplab_{m}'))

    lines = [f'| metric | reference (torch) | this repo (fused) | delta |',
             f'|---|---|---|---|']
    worst = 0.0
    for ref_key, jax_key in pairs:
        r, j = ref_logs.get(ref_key), jax_logs.get(jax_key)
        if r is None or j is None:
            continue
        d = abs(r - j)
        worst = max(worst, d)
        lines.append(f'| {ref_key} | {r:.6f} | {j:.6f} | {d:.2e} |')
    report = '\n'.join(lines)
    print(report)
    print(f'# worst |delta| = {worst:.3e} '
          f'({"within" if worst <= 0.1 else "EXCEEDS"} the 0.1 bar)')
    if args.report:
        with open(args.report, 'w') as f:
            f.write(report + f'\n\nworst |delta| = {worst:.3e}\n')


if __name__ == '__main__':
    main()
