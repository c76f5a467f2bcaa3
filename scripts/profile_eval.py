"""Trace the fused EVAL step (forward + postproc + merge + metric
states) and print top ops by device time. Usage:
python scripts/profile_eval.py [--batch-size 8] [--steps 3]"""
import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--steps', type=int, default=3)
    parser.add_argument('--logdir', default='/tmp/mtsa_prof_eval')
    parser.add_argument('--top', type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    from nicr_mtsa_tpu.data import mt_collate
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
    from nicr_mtsa_tpu.testing.preprocessing import get_dummy_sample
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
        # bench --eval keeps the non-deferred reduce (metric
        # numbers bit-identical to the standard model) -- match it
        defer_semantic_prediction_upsampling=False,
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
            'panoptic': PanopticTaskHelper(
                semantic_n_classes=n_with_void,
                semantic_classes_is_thing=is_thing_v),
            'scene': SceneTaskHelper(n_classes=10),
        })

    pre = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=is_thing_v),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=H, width=W),
        MultiscaleSupervisionGenerator(
            downscales=(4, 8, 16, 32),
            keys=('semantic', 'instance', 'orientations')),
        InstanceTargetGenerator(
            sigma=8, semantic_classes_is_thing=is_thing_v,
            sigma_for_additional_downscales={4: 2, 8: 2, 16: 1, 32: 1}),
        OrientationTargetGenerator(
            semantic_classes_estimate_orientation=is_thing_v),
        PanopticTargetGenerator(semantic_classes_is_thing=is_thing_v),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])
    B = args.batch_size
    samples = []
    for i in range(B):
        s = get_dummy_sample()
        s['scene'] = (i % 9) + 1
        samples.append(pre(s))
    batch = mt_collate(samples)

    static_batch = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY]}
    # match bench --eval: metric-only epoch (output_keys=()) so the
    # fullres prediction buffers are DCE'd like the measured program
    step = pipeline.make_fused_eval_step(static_batch, output_keys=())
    arrays = jax.tree_util.tree_map(jax.device_put,
                                    strip_non_arrays(batch))
    jax.block_until_ready(arrays)
    states = {name: helper.empty_metric_states()
              for name, helper in pipeline.task_helpers.items()
              if hasattr(helper, 'empty_metric_states')}
    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(arrays))
    _, _, states = step(state['params'], state['batch_stats'],
                        arrays, states)
    jax.block_until_ready(states)
    print('compiled; tracing...', file=sys.stderr)

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        _, losses, states = step(state['params'], state['batch_stats'],
                                 arrays, states)
    jax.block_until_ready(states)
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

    # rollup by op family. async copy-start/done durations measure
    # issue->completion and alias the producers they wait on, so the
    # rollup separates them from real compute
    import re
    fam = defaultdict(lambda: [0.0, 0])
    for name, ms in per_op.items():
        m = re.match(r'%([a-zA-Z_\-]+[a-zA-Z_])', name)
        key = m.group(1) if m else name[:30]
        fam[key][0] += ms
        fam[key][1] += 1
    async_ms = sum(v for k, (v, _) in fam.items()
                   if k.startswith(('copy-start', 'copy-done')))
    print(f'\n-- rollup (compute total '
          f'{total - async_ms:.1f} ms; async-copy wait '
          f'{async_ms:.1f} ms aliases producers) --')
    for key, (ms, n) in sorted(fam.items(), key=lambda kv: -kv[1][0]):
        if ms < 1.0:
            continue
        print(f'{ms:9.3f} ms  x{n:<4d} {key}')


if __name__ == '__main__':
    main()
