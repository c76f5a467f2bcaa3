"""Trace the multi-task TRAIN step and print top ops by device time.
Usage: python scripts/profile_train.py [--batch-size 32] [--steps 3]"""
import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--steps', type=int, default=3)
    parser.add_argument('--logdir', default='/tmp/mtsa_prof_train')
    parser.add_argument('--top', type=int, default=30)
    args = parser.parse_args()

    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.pipeline import (
        MultiTaskPipeline, default_postprocessors, strip_non_arrays,
    )
    from nicr_mtsa_tpu.tasks import (
        InstanceTaskHelper, SceneTaskHelper, SemanticTaskHelper,
    )
    from profile_bench import parse_xplane

    H, W = 480, 640
    n_classes = 40
    is_thing = tuple(i < 8 for i in range(n_classes))
    n_with_void = n_classes + 1
    is_thing_v = (False,) + tuple(is_thing)

    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet34', backbone_depth='resnet34',
        resnet_block='nonbottleneck1d', context_n_channels=512,
        decoder_n_channels=(512, 256, 128), decoder_n_blocks=3,
        input_size=(H, W), semantic_n_classes=n_classes,
        scene_n_classes=10,
        upsampling='learned-3x3-zeropad',
        prediction_upsampling='learned-3x3-zeropad',
        dtype=jnp.bfloat16)
    model = build_model(config)

    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=('semantic', 'instance', 'orientation', 'scene',
                   'panoptic'),
            semantic_classes_is_thing=is_thing, top_k_instances=64),
        task_helpers={
            'semantic': SemanticTaskHelper(n_classes=n_classes),
            'instance': InstanceTaskHelper(
                semantic_n_classes=n_with_void,
                semantic_classes_is_thing=is_thing_v,
                top_k_instances=64),
            'scene': SceneTaskHelper(n_classes=10),
        },
        optimizer=optax.adamw(1e-4))

    rng = np.random.default_rng(0)
    B = args.batch_size
    batch = {
        'rgb': rng.normal(size=(B, H, W, 3)).astype(np.float32),
        'depth': rng.normal(size=(B, H, W, 1)).astype(np.float32),
        'semantic': rng.integers(0, n_with_void, (B, H, W)).astype(
            np.int32),
        'instance_center': rng.random((B, H, W)).astype(np.float32),
        'instance_offset': rng.normal(size=(B, H, W, 2)).astype(
            np.float32),
        'instance_foreground': rng.random((B, H, W)) > 0.5,
        'instance_center_mask': rng.random((B, H, W)) > 0.3,
        'orientation': rng.normal(size=(B, H, W, 2)).astype(np.float32),
        'orientation_foreground': rng.random((B, H, W)) > 0.5,
        'scene': rng.integers(1, 10, (B,)).astype(np.int32),
    }
    batch = jax.tree_util.tree_map(jax.device_put,
                                   strip_non_arrays(batch))
    jax.block_until_ready(batch)
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(batch))
    key = jax.random.PRNGKey(1)
    state, _ = pipeline.train_step(state, batch, rng=key)
    jax.block_until_ready(state)
    print('compiled; tracing...', file=sys.stderr)

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        state, losses = pipeline.train_step(
            state, batch, rng=jax.random.fold_in(key, i))
    jax.block_until_ready(state)
    jax.profiler.stop_trace()
    dt = (time.perf_counter() - t0) / args.steps
    print(f'wall per step: {dt*1000:.1f} ms ({B/dt:.1f} frames/s)')

    totals = parse_xplane(args.logdir)
    per_op = defaultdict(float)
    for (plane, line, name), ms in totals.items():
        if 'XLA Ops' in line:
            per_op[name] += ms / args.steps
    total = sum(per_op.values())
    print(f'device op time per step: {total:.2f} ms')
    for name, ms in sorted(per_op.items(),
                           key=lambda kv: -kv[1])[:args.top]:
        print(f'{ms:9.3f} ms  {100 * ms / total:5.1f}%  {name[:120]}')


if __name__ == '__main__':
    main()
