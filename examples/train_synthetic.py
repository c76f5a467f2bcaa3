"""End-to-end training example on synthetic data.

Demonstrates every layer of the framework working together -- the loop
the reference delegates to the external EMSANet repo:

  synthetic RGB-D dataset -> preprocessing chain -> threaded loader ->
  jitted multi-task train step (DWA loss weighting) -> fused eval step
  (PQ/mIoU/MAE states on device) -> checkpoint policy + orbax/pickle
  checkpoints + CSV logging.

Runs on CPU or TPU:
    python examples/train_synthetic.py --epochs 2 --steps 4 [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=2)
    parser.add_argument('--steps', type=int, default=4)
    parser.add_argument('--batch-size', type=int, default=2)
    parser.add_argument('--size', type=int, nargs=2, default=(96, 128))
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--out', default='/tmp/mtsa_run')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nicr_mtsa_tpu.data import mt_collate
    from nicr_mtsa_tpu.data.loader import DataLoader
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, FullResCloner, InstanceClearStuffIDs,
        InstanceTargetGenerator, MultiscaleSupervisionGenerator,
        NormalizeDepth, NormalizeRGB, OrientationTargetGenerator,
        PanopticTargetGenerator, RandomHSVJitter, RandomHorizontalFlip,
        Resize, ToDeviceArrays,
    )
    from nicr_mtsa_tpu.data.preprocessing.base import (
        APPLIED_PREPROCESSING_KEY,
    )
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.parallel.checkpoint import save_checkpoint
    from nicr_mtsa_tpu.pipeline import (
        MultiTaskPipeline, default_postprocessors, strip_non_arrays,
    )
    from nicr_mtsa_tpu.tasks import (
        InstanceTaskHelper, PanopticTaskHelper, SceneTaskHelper,
        SemanticTaskHelper,
    )
    from nicr_mtsa_tpu.testing.dataset import get_dataset
    from nicr_mtsa_tpu.utils import (
        CheckpointHelper, CSVLogger, cprint, cprint_step,
    )
    from nicr_mtsa_tpu.weighting import DynamicWeightAverage

    H, W = args.size
    n_classes_with_void = 11
    is_thing = tuple(i in (1, 2, 3) for i in range(n_classes_with_void))

    train_pre = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=is_thing),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=H, width=W),
        RandomHSVJitter(0.05, 0.1, 0.1),
        RandomHorizontalFlip(p=0.5),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32),
            keys=('semantic', 'instance', 'orientations')),
        InstanceTargetGenerator(
            sigma=8, semantic_classes_is_thing=is_thing,
            sigma_for_additional_downscales={4: 2, 8: 2, 16: 1, 32: 1}),
        OrientationTargetGenerator(
            semantic_classes_estimate_orientation=is_thing),
        PanopticTargetGenerator(semantic_classes_is_thing=is_thing),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])

    n_samples = args.steps * args.batch_size
    dataset = get_dataset(preprocessor=train_pre, n_samples=n_samples,
                          height=2 * H, width=2 * W)
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        num_workers=2, collate_fn=mt_collate,
                        drop_last=True)

    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock',
        context_n_channels=128,
        decoder_n_channels=(64, 48, 32), decoder_n_blocks=1,
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(H, W),
        semantic_n_classes=n_classes_with_void - 1, scene_n_classes=5,
    )
    model = build_model(config)

    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=config.tasks + ('panoptic',),
            semantic_classes_is_thing=is_thing[1:],
            top_k_instances=32),
        task_helpers={
            'semantic': SemanticTaskHelper(
                n_classes=n_classes_with_void - 1),
            'instance': InstanceTaskHelper(
                semantic_n_classes=n_classes_with_void,
                semantic_classes_is_thing=is_thing,
                top_k_instances=32),
            'panoptic': PanopticTaskHelper(
                semantic_n_classes=n_classes_with_void,
                semantic_classes_is_thing=is_thing),
            'scene': SceneTaskHelper(n_classes=5),
        },
        loss_weighting=DynamicWeightAverage((
            'semantic_total_loss', 'instance_center_total_loss',
            'instance_offset_total_loss',
            'instance_orientation_total_loss', 'scene_total_loss')),
        optimizer=optax.adamw(3e-4),
    )

    os.makedirs(args.out, exist_ok=True)
    logger = CSVLogger(os.path.join(args.out, 'log.csv'))
    ckpt_helper = CheckpointHelper(metric_names=('valid_semantic_miou',
                                                'panoptic_all_deeplab_pq'),
                                   debug=False)

    first_batch = next(iter(loader))
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(first_batch))

    for epoch in range(args.epochs):
        # --- train ----------------------------------------------------------
        for batch_idx, batch in enumerate(loader):
            state, losses = pipeline.train_step(
                state, strip_non_arrays(batch), batch_idx=batch_idx,
                rng=jax.random.PRNGKey(epoch * 1000 + batch_idx))
        train_loss = float(losses['total_loss'])

        # --- validate (stateful helpers path) -------------------------------
        for batch_idx, batch in enumerate(loader):
            pipeline.validation_step(state, batch, batch_idx=batch_idx)
        artifacts, examples, metrics = pipeline.validation_epoch_end()

        logs = {'epoch': epoch, 'train_total_loss': train_loss}
        logs.update({
            f'valid_{k}': float(np.asarray(v))
            for k, v in metrics.items()
            if np.ndim(np.asarray(v)) == 0
        })
        to_save = ckpt_helper.check_for_checkpoint(logs)
        logger.log(logs)
        cprint_step(f"epoch {epoch}: loss={train_loss:.3f} "
              f"miou={logs.get('valid_semantic_miou', float('nan')):.3f} "
              f"pq="
              f"{logs.get('valid_panoptic_all_deeplab_pq', float('nan')):.3f} "
              f"dwa={ {k: round(v, 2) for k, v in
                      pipeline.loss_weighting.weights.items()} }")

        if to_save:
            path = save_checkpoint(
                os.path.join(args.out, f'ckpt_epoch{epoch}'),
                state,
                extra={'epoch': epoch,
                       'dwa': pipeline.loss_weighting.state_dict()})
            cprint(f'  checkpoint -> {path} ({sorted(to_save)})',
                   color='green')

    logger.write()
    print('done; log at', os.path.join(args.out, 'log.csv'))


if __name__ == '__main__':
    main()
