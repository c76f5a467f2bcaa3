"""Serving example: raw uint8 RGB + uint16 depth -> panoptic maps.

The whole serving path (normalize -> forward -> NMS -> grouping ->
merge) runs as ONE jit program on device via PanopticInferencePipeline
(the bench.py path); this script adds the host-side visualization the
reference produces for its qualitative figures.

    python examples/infer_panoptic.py [--cpu] [--out /tmp/mtsa_infer]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--out', default='/tmp/mtsa_infer')
    parser.add_argument('--size', type=int, nargs=2, default=(128, 160))
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )
    from nicr_mtsa_tpu.testing.preprocessing import get_dummy_sample
    from nicr_mtsa_tpu.visualization import (
        visualize_depth_pil, visualize_panoptic_pil,
        visualize_semantic_pil, generate_semantic_colors,
    )

    H, W = args.size
    n_classes = 11
    is_thing = tuple(i < 4 for i in range(n_classes))

    config = MultiTaskModelConfig(
        tasks=('semantic', 'instance', 'orientation', 'scene'),
        backbone_rgb='resnet18', backbone_depth='resnet18',
        resnet_block='basicblock',
        context_n_channels=128,
        decoder_n_channels=(64, 48, 32), decoder_n_blocks=1,
        upsampling='bilinear', prediction_upsampling='bilinear',
        input_size=(H, W),
        semantic_n_classes=n_classes, scene_n_classes=5,
    )
    model = build_model(config)

    post = PanopticPostprocessing(
        semantic_postprocessing=SemanticPostprocessing(),
        instance_postprocessing=InstancePostprocessing(
            heatmap_threshold=0.1, heatmap_nms_kernel_size=3,
            top_k_instances=16),
        semantic_classes_is_thing=is_thing,
        semantic_class_has_orientation=is_thing,
    )
    pipe = PanopticInferencePipeline(model, post,
                                     compute_dtype=jnp.float32)

    # input frame: the synthetic 512x512 RGB-D fixture, resized on host
    sample = get_dummy_sample()
    from nicr_mtsa_tpu.data.preprocessing.resize import (
        resize_image_bilinear, resize_image_nearest,
    )
    rgb = resize_image_bilinear(sample['rgb'], H, W)[None]
    depth = resize_image_nearest(sample['depth'], H, W)[None]

    variables = jax.jit(
        lambda k: model.init(
            {'params': k},
            pipe.preprocess(jnp.asarray(rgb), jnp.asarray(depth)),
            train=False)
    )(jax.random.PRNGKey(0))

    out = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
    jax.block_until_ready(out)

    panoptic = np.asarray(out['panoptic'][0])
    semantic = np.asarray(out['semantic_idx'][0])
    print('panoptic ids:', sorted(np.unique(panoptic).tolist())[:12])
    print('semantic classes:', sorted(np.unique(semantic).tolist()))
    print('scene logits:', np.asarray(out['scene_logits'][0]).round(2))

    os.makedirs(args.out, exist_ok=True)
    colors = generate_semantic_colors(n_classes + 1)
    visualize_panoptic_pil(
        panoptic, classes_is_thing=(False,) + is_thing,
        classes_colors=colors).save(
        os.path.join(args.out, 'panoptic.png'))
    visualize_semantic_pil(semantic, colors=colors[1:]).save(
        os.path.join(args.out, 'semantic.png'))
    visualize_depth_pil(depth[0]).save(
        os.path.join(args.out, 'depth.png'))
    print('wrote panoptic.png / semantic.png / depth.png to', args.out)


if __name__ == '__main__':
    main()
