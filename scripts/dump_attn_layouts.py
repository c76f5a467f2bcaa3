"""Dump the compiled-HLO layouts around the fused window-attention
custom calls in the EMSAFormer serve program (PERF.md roofline: the
q/k/v relayout copies are the top EMSAFormer cost; this prints the
exact producer/consumer layouts the kernel must accept to kill them).

    python scripts/dump_attn_layouts.py [--attn-qkv] [--batch-size 128]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=128)
    parser.add_argument('--attn-qkv', action='store_true')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--full', action='store_true',
                        help='dump the whole HLO to /tmp/emsaformer.hlo')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from nicr_mtsa_tpu.configs import BENCH_CONFIGS
    from nicr_mtsa_tpu.models.multi_task import build_model
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )
    import dataclasses

    H, W = 480, 640
    n_classes = 40
    is_thing = tuple(i < 8 for i in range(n_classes))
    config = BENCH_CONFIGS['emsaformer_dve_v2'](
        input_size=(H, W), dtype=jnp.bfloat16)
    # match the bench serve program exactly (incl. the deferred
    # bilinear finisher -- the raw model forward alone materializes a
    # 20 GB fullres-ladder copy at B128 and will not even compile)
    config = dataclasses.replace(
        config, defer_semantic_prediction_upsampling='all')
    if args.attn_qkv:
        config = dataclasses.replace(config,
                                     backbone_attn_backend='pallas-qkv')
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

    B = args.batch_size
    rgb = jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8)
    depth = jax.ShapeDtypeStruct((B, H, W), jnp.uint16)
    inputs = {'rgbd': jnp.zeros((1, H, W, 4), jnp.bfloat16)}
    var_shapes = jax.eval_shape(
        lambda r: model.init({'params': r}, inputs, train=False),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), var_shapes)

    lowered = jax.jit(pipe._infer_impl).lower(variables, rgb, depth)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.full:
        with open('/tmp/emsaformer.hlo', 'w') as f:
            f.write(hlo)
        print('wrote /tmp/emsaformer.hlo', file=sys.stderr)

    # find custom-call lines (pallas kernels) and any copy/transpose
    # ops whose operands feed them or consume them
    lines = hlo.splitlines()
    interesting = re.compile(
        r'custom-call|tpu_custom_call|%copy|copy\(|transpose\(')
    layout = re.compile(r'\{[0-9,]+\}')
    for i, ln in enumerate(lines):
        if 'custom-call' in ln or 'copy' in ln and '38400' in ln \
                or 'transpose' in ln and '38400' in ln:
            ln = ln.strip()
            if len(ln) > 240:
                ln = ln[:240] + '...'
            print(f'{i:6d}: {ln}')

    # summarize copy ops by shape
    from collections import Counter
    copies = Counter()
    for ln in lines:
        m = re.search(r'%copy[^=]*= ([a-z0-9]+)\[([0-9,]+)\]\{([0-9,]+)\}',
                      ln)
        if m:
            copies[(m.group(1), m.group(2), m.group(3))] += 1
    print('\n# copy ops by (dtype, shape, layout):')
    for (dt, shape, lay), n in copies.most_common(30):
        print(f'  {n:4d} x {dt}[{shape}]{{{lay}}}')


if __name__ == '__main__':
    main()
