"""Multi-chip serving example: data-parallel panoptic inference over a
jax.sharding.Mesh.

The fused serving program (normalize -> forward -> NMS -> grouping ->
merge, one jit) is per-image, so it scales linearly over the mesh's
`data` axis with replicated parameters and no collectives on the
critical path (parallel/train.py:make_sharded_infer). On hardware this
is the v5e-8 deployment shape behind the 5000 frames/s north star; on
CPU it runs against virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/serve_sharded.py --cpu --devices 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--devices', type=int, default=None)
    parser.add_argument('--size', type=int, nargs=2, default=(128, 160))
    parser.add_argument('--batch-per-device', type=int, default=2)
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
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

    H, W = args.size
    n_classes = 12
    is_thing = tuple(i < 4 for i in range(n_classes))

    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock', context_n_channels=64,
        decoder_n_channels=(32, 24, 16), decoder_n_blocks=1,
        input_size=(H, W), semantic_n_classes=n_classes,
        scene_n_classes=5, dtype=jnp.bfloat16)
    model = build_model(config)
    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=16),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing)
    pipe = PanopticInferencePipeline(model, post)

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev, ('data',))
    infer = make_sharded_infer(pipe, mesh)
    print(f'mesh: {mesh}')

    B = args.batch_per_device * n_dev
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(
        rng.integers(0, 2 ** 14, (B, H, W), dtype=np.uint16))

    variables = jax.jit(
        lambda k: model.init(
            {'params': k}, pipe.preprocess(rgb, depth), train=False)
    )(jax.random.PRNGKey(0))

    out = infer(variables, rgb, depth)          # compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = infer(variables, rgb, depth)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pan = out['panoptic']
    print(f'panoptic {pan.shape} sharded as {pan.sharding.spec} '
          f'over {n_dev} devices')
    print(f'{B * iters / dt:.1f} frames/s total '
          f'({B * iters / dt / n_dev:.1f} per device)')


if __name__ == '__main__':
    main()
