"""Real-data evaluation example: directory dataset -> preprocessing ->
fused device eval -> metric report.

The dataset is any directory in the layout documented in
nicr_mtsa_tpu/data/dataset.py (the reference's external
nicr-scene-analysis-datasets sample interface; convert a prepared
tree with scripts/convert_nicr_dataset.py, or use the checked-in
fixture). All of postprocessing, the panoptic merge, and the
PQ/mIoU metric-state updates run inside ONE jit program per batch --
the pipeline the reference executes as torch forward + CPU merge + a
PQ spawn pool.

    python examples/eval_dataset.py \
        --dataset tests/fixtures/mini_dataset --split valid [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', default='tests/fixtures/mini_dataset')
    parser.add_argument('--split', default='valid')
    parser.add_argument('--batch-size', type=int, default=2)
    parser.add_argument('--size', type=int, nargs=2, default=(96, 128))
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--checkpoint', default='',
                        help='optional orbax/pickle checkpoint dir '
                             '(random init otherwise)')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from nicr_mtsa_tpu.data.dataset import get_dataset
    from nicr_mtsa_tpu.data.loader import DataLoader
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, FullResCloner, InstanceClearStuffIDs,
        InstanceTargetGenerator, MultiscaleSupervisionGenerator,
        NormalizeDepth, NormalizeRGB, OrientationTargetGenerator,
        PanopticTargetGenerator, Resize, ToDeviceArrays,
    )
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
        InstanceTaskHelper, PanopticTaskHelper, SceneTaskHelper,
        SemanticTaskHelper,
    )

    H, W = args.size
    ds = get_dataset(args.dataset, split=args.split)
    cfg = ds.config
    without_void = cfg.semantic_label_list_without_void
    n_classes = len(without_void)
    is_thing = without_void.classes_is_thing
    is_thing_v = (False,) + tuple(is_thing)
    n_scenes = max(2, len(cfg.scene_label_list))

    ds.preprocessor = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=is_thing_v),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=H, width=W),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32),
            keys=('semantic', 'instance', 'orientations')),
        InstanceTargetGenerator(sigma=8,
                                semantic_classes_is_thing=is_thing_v),
        OrientationTargetGenerator(
            semantic_classes_estimate_orientation=is_thing_v),
        PanopticTargetGenerator(semantic_classes_is_thing=is_thing_v),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=cfg.depth_mean,
                       depth_std=cfg.depth_std,
                       raw_depth=cfg.depth_mode == 'raw'),
        ToDeviceArrays(),
    ])

    model = build_model(MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=64,
        decoder_n_channels=(64, 48, 32), decoder_n_blocks=1,
        input_size=(H, W), semantic_n_classes=n_classes,
        scene_n_classes=n_scenes))
    helpers = {
        'semantic': SemanticTaskHelper(n_classes=n_classes),
        'instance': InstanceTaskHelper(
            semantic_n_classes=n_classes + 1,
            semantic_classes_is_thing=is_thing_v,
            top_k_instances=32),
        'panoptic': PanopticTaskHelper(
            semantic_n_classes=n_classes + 1,
            semantic_classes_is_thing=is_thing_v),
        'scene': SceneTaskHelper(n_classes=n_scenes),
    }
    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=('semantic', 'instance', 'orientation', 'scene',
                   'panoptic'),
            semantic_classes_is_thing=is_thing,
            top_k_instances=32),
        task_helpers=helpers)

    loader = DataLoader(ds, batch_size=args.batch_size, num_workers=2)
    state = None
    step = None
    states = {}
    for batch in loader:
        arrays = strip_non_arrays(batch)
        if state is None:
            state = pipeline.create_train_state(
                jax.random.PRNGKey(0), pipeline.model_inputs(arrays))
            if args.checkpoint:
                from nicr_mtsa_tpu.parallel.checkpoint import (
                    load_checkpoint,
                )
                state = load_checkpoint(args.checkpoint, target=state)
            static_batch = {APPLIED_PREPROCESSING_KEY:
                            batch[APPLIED_PREPROCESSING_KEY]}
            step = pipeline.make_fused_eval_step(static_batch,
                                                 output_keys=())
            states = {n: h.empty_metric_states()
                      for n, h in helpers.items()
                      if hasattr(h, 'empty_metric_states')}
        _, losses, states = step(state['params'], state['batch_stats'],
                                 arrays, states)

    print(f'evaluated {len(ds)} samples of {args.dataset}:{args.split}')
    for name, helper in helpers.items():
        if name in states and hasattr(helper, 'load_metric_states'):
            helper.load_metric_states(states[name])
            _, _, logs = helper.validation_epoch_end()
            for k, v in sorted(logs.items()):
                if np.ndim(v) == 0 and 'time' not in k:
                    print(f'  {k}: {float(v):.4f}')


if __name__ == '__main__':
    main()
