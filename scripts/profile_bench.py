"""Trace the bench pipeline on the TPU and print top ops by device time.

Usage: python scripts/profile_bench.py [--batch-size 128] [--steps 3]

Parses the xplane protobuf directly (no TensorBoard needed) and
aggregates per-op durations on the device plane.
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(
        logdir, 'plugins/profile/*/*.xplane.pb'))
    assert paths, f'no xplane under {logdir}'
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], 'rb') as f:
        xspace.ParseFromString(f.read())

    totals = defaultdict(float)
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'device' not in plane.name.lower():
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if 'XLA Ops' not in line.name and 'Steps' not in line.name:
                # on TPU planes the op line is usually 'XLA Ops'
                pass
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, '?')
                totals[(plane.name, line.name, name)] += \
                    ev.duration_ps / 1e9   # ms
    return totals


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=128)
    parser.add_argument('--steps', type=int, default=3)
    parser.add_argument('--logdir', default='/tmp/mtsa_prof')
    parser.add_argument('--top', type=int, default=40)
    parser.add_argument('--model', default='emsanet-bench',
                        help="'emsanet-bench' or a configs.BENCH_CONFIGS "
                             "preset name (mirrors bench.py)")
    parser.add_argument('--attn-chunk', type=int, default=0,
                        help='images per Swin window-attention chunk')
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    H, W = 480, 640
    n_classes = 40
    is_thing = tuple(i < 8 for i in range(n_classes))
    if args.model == 'emsanet-bench':
        config = MultiTaskModelConfig(
            tasks=('semantic', 'instance', 'orientation', 'scene'),
            backbone_rgb='resnet34', backbone_depth='resnet34',
            resnet_block='nonbottleneck1d',
            context_n_channels=512,
            decoder_n_channels=(512, 256, 128), decoder_n_blocks=3,
            input_size=(H, W), semantic_n_classes=n_classes,
            scene_n_classes=10,
            upsampling='learned-3x3-zeropad',
            prediction_upsampling='learned-3x3-zeropad',
            defer_semantic_prediction_upsampling='all',  # match bench.py
            dtype=jnp.bfloat16,
        )
    else:
        import dataclasses
        from nicr_mtsa_tpu.configs import BENCH_CONFIGS
        config = BENCH_CONFIGS[args.model](
            input_size=(H, W), dtype=jnp.bfloat16)
        if config.prediction_upsampling == 'learned-3x3-zeropad':
            config = dataclasses.replace(
                config, defer_semantic_prediction_upsampling='all')
        elif config.prediction_upsampling == 'bilinear':
            config = dataclasses.replace(
                config, defer_semantic_prediction_upsampling='all')
        if args.attn_chunk and config.backbone_rgbd \
                and config.backbone_rgbd.startswith('swin'):
            config = dataclasses.replace(
                config, backbone_attn_chunk_size=args.attn_chunk)
    model = build_model(config)
    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=64),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing,
    )
    pipe = PanopticInferencePipeline(model, post)

    rng = np.random.default_rng(0)
    B = args.batch_size
    rgb = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.integers(0, 2 ** 14, (B, H, W),
                                     dtype=np.uint16))
    inputs = pipe.preprocess(rgb, depth)
    variables = jax.jit(
        lambda k: model.init({'params': k}, inputs, train=False)
    )(jax.random.PRNGKey(0))

    out = pipe(variables, rgb, depth)          # compile
    jax.block_until_ready(out)
    print('compiled; tracing...', file=sys.stderr)

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        out = pipe(variables, rgb, depth)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    totals = parse_xplane(args.logdir)
    per_op = defaultdict(float)
    for (plane, line, name), ms in totals.items():
        if 'XLA Ops' in line:
            per_op[name] += ms / args.steps
    total = sum(per_op.values())
    print(f'device op time per step: {total:.2f} ms '
          f'(batch {B} -> {B / total * 1000:.1f} frames/s upper bound)')
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f'{ms:9.3f} ms  {100 * ms / total:5.1f}%  {name[:110]}')

    # rollup by op family (async copy durations alias their producers)
    import re
    fam = defaultdict(lambda: [0.0, 0])
    for name, ms in per_op.items():
        mm = re.match(r'%([a-zA-Z_\-]+[a-zA-Z_])', name)
        key = mm.group(1) if mm else name[:30]
        fam[key][0] += ms
        fam[key][1] += 1
    async_ms = sum(v for k, (v, _) in fam.items()
                   if k.startswith(('copy-start', 'copy-done')))
    print(f'\n-- rollup (compute total {total - async_ms:.1f} ms; '
          f'async-copy wait {async_ms:.1f} ms aliases producers) --')
    for key, (ms, n) in sorted(fam.items(), key=lambda kv: -kv[1][0]):
        if ms >= 1.0:
            print(f'{ms:9.3f} ms  x{n:<4d} {key}')


if __name__ == '__main__':
    main()
