"""End-to-end panoptic inference benchmark (the BASELINE.json north
star): uint8 RGB-D frames -> on-device normalize -> EMSANet-style
forward (bf16) -> center NMS -> offset grouping -> panoptic merge,
all fused into one jit program, measured in frames/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the driver target of 5000 frames/s on a
v5e-8, i.e. 625 frames/s/chip.
"""
import argparse
import json
import sys
import time

import numpy as np


def run_train_bench(args, model, H, W, n_classes, is_thing, rng):
    """Multi-task train-step throughput (forward + losses + grads +
    adam update in one jit program)."""
    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nicr_mtsa_tpu.pipeline import (
        MultiTaskPipeline, default_postprocessors, strip_non_arrays,
    )
    from nicr_mtsa_tpu.tasks import (
        InstanceTaskHelper, SceneTaskHelper, SemanticTaskHelper,
    )

    n_with_void = n_classes + 1
    is_thing_v = (False,) + tuple(is_thing)

    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=('semantic', 'instance', 'orientation', 'scene',
                   'panoptic'),
            semantic_classes_is_thing=is_thing,
            top_k_instances=64),
        task_helpers={
            'semantic': SemanticTaskHelper(n_classes=n_classes),
            'instance': InstanceTaskHelper(
                semantic_n_classes=n_with_void,
                semantic_classes_is_thing=is_thing_v,
                top_k_instances=64),
            'scene': SceneTaskHelper(n_classes=10),
        },
        # bf16 first moment halves the larger Adam buffer (~200 MB of
        # f32 params at the flagship size): closes the former B128+
        # remat OOM-by-95M (PERF.md batch-size boundaries); the second
        # moment stays f32 (bf16 nu loses too much precision in the
        # sqrt denominator)
        optimizer=optax.adamw(
            1e-4, mu_dtype=jnp.bfloat16 if args.mu_bf16 else None),
        # the bench loop is `state = step(state, ...)`: donate so
        # params/opt buffers update in place (no double-buffering)
        donate_train_state=True,
    )

    # sweep: 16 -> 69.8, 32 -> 83.5, 48 -> 93.6, 64 -> 91.6 f/s
    B = args.batch_size or (2 if args.quick else 48)
    if getattr(model, 'encoder', None) is not None and \
            getattr(model.encoder, 'backbone', None) is not None and \
            getattr(model.encoder.backbone, 'n_input_channels', 3) == 4:
        # single 4-channel multimodal backbone (swin-multi-*)
        modalities = {
            'rgbd': rng.normal(size=(B, H, W, 4)).astype(np.float32)}
    else:
        modalities = {
            'rgb': rng.normal(size=(B, H, W, 3)).astype(np.float32),
            'depth': rng.normal(size=(B, H, W, 1)).astype(np.float32)}
    batch = {
        **modalities,
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
    batch = strip_non_arrays(batch)
    # place the batch on device ONCE -- numpy inputs would re-transfer
    # ~hundreds of MB per step (measured 15x slowdown via the tunnel)
    batch = jax.tree_util.tree_map(jax.device_put, batch)
    jax.block_until_ready(batch)

    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(batch))

    key = jax.random.PRNGKey(1)
    state, losses = pipeline.train_step(state, batch, rng=key)  # compile
    float(losses['total_loss'])

    # end timing with a scalar FETCH, not block_until_ready: on the
    # axon tunnel block_until_ready can return before the queued
    # executions finish (observed 10-20x inflated f/s); a device->host
    # read of the final step's output cannot
    iters = 3 if args.quick else args.iters
    t0 = time.perf_counter()
    for i in range(iters):
        state, losses = pipeline.train_step(
            state, batch, rng=jax.random.fold_in(key, i))
    float(losses['total_loss'])
    dt = time.perf_counter() - t0
    fps = B * iters / dt
    print(json.dumps({
        'metric': 'multitask_train_frames_per_sec_per_chip_640x480'
                  if not args.quick else
                  'multitask_train_frames_per_sec_per_chip_quick',
        'value': round(fps, 2),
        'unit': 'frames/s/chip',
        'vs_baseline': 0.0,     # no train-throughput baseline defined
    }))


def run_eval_bench(args, model, H, W, n_classes, is_thing, emit=True,
                   config=None):
    """Fused eval-step throughput: the full preproc-targets -> forward
    -> postprocessing -> panoptic merge -> metric-state chain in one
    jit program (the north-star description incl. metrics).

    With emit=False, prints nothing and returns the measured frames/s
    (used by the default serving bench to report BOTH paths in its
    single JSON line -- the driver-visible number must not hide the
    metrics-inclusive path, round-4 verdict item 8)."""
    import json
    import time

    import jax
    import numpy as np

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
    from nicr_mtsa_tpu.pipeline import (
        MultiTaskPipeline, default_postprocessors, strip_non_arrays,
    )
    from nicr_mtsa_tpu.tasks import (
        InstanceTaskHelper, PanopticTaskHelper, SceneTaskHelper,
        SemanticTaskHelper,
    )
    from nicr_mtsa_tpu.testing.preprocessing import get_dummy_sample

    n_with_void = n_classes + 1
    is_thing_v = (False,) + tuple(is_thing)

    tasks = tuple(getattr(config, 'tasks', ()) or
                  ('semantic', 'instance', 'orientation', 'scene'))
    with_dve = 'dense_visual_embedding' in tasks
    embedding_dim = getattr(config, 'embedding_dim', 512) or 512

    rng_e = np.random.default_rng(7)

    def _unit_rows(n, d):
        m = rng_e.normal(size=(n, d)).astype(np.float32)
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    dve_kwargs = {}
    task_helpers = {
        'semantic': SemanticTaskHelper(n_classes=n_classes),
        'instance': InstanceTaskHelper(
            semantic_n_classes=n_with_void,
            semantic_classes_is_thing=is_thing_v,
            top_k_instances=64),
        'panoptic': PanopticTaskHelper(
            semantic_n_classes=n_with_void,
            semantic_classes_is_thing=is_thing_v),
        'scene': SceneTaskHelper(n_classes=10),
    }
    if with_dve:
        # synthetic class-embedding tables for the text / visual-mean
        # retrieval heads (the reference loads CLIP text + distilled
        # visual-mean embeddings; throughput is embedding-agnostic)
        from nicr_mtsa_tpu.tasks import DenseVisualEmbeddingTaskHelper
        dve_kwargs = dict(
            with_text_embeddings_per_class=True,
            text_embeddings_per_class=_unit_rows(
                n_classes, embedding_dim),
            with_mean_visual_embedding_per_class=True,
            mean_visual_embedding_per_class=_unit_rows(
                n_classes, embedding_dim))
        task_helpers['dense_visual_embedding'] = \
            DenseVisualEmbeddingTaskHelper(n_classes=n_classes)

    pipeline = MultiTaskPipeline(
        model=model,
        postprocessors=default_postprocessors(
            tasks=tasks + ('panoptic',),
            semantic_classes_is_thing=is_thing,
            top_k_instances=64, **dve_kwargs),
        task_helpers=task_helpers,
    )

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
        PanopticTargetGenerator(
            semantic_classes_is_thing=is_thing_v,
            segment_table_size=args.segment_table_size),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])
    # large batches became viable once metric-only epochs stopped
    # returning the fullres buffer inventory -- XLA DCE's them and the
    # old OOM source with them; hardware sweep: 32 -> 204.7,
    # 64 -> 244.7, 128 -> 296.7 f/s (see PERF.md)
    B = args.batch_size or (2 if args.quick else 128)
    if getattr(args, 'dataset', None):
        # real data: cycle the split to fill the batch (reference
        # sample interface via data/dataset.py DirectoryRGBDDataset)
        from nicr_mtsa_tpu.data.dataset import get_dataset
        ds = get_dataset(args.dataset, split=args.dataset_split)
        samples = [pre(dict(ds[i % len(ds)])) for i in range(B)]
    else:
        samples = []
        for i in range(B):
            s = get_dummy_sample()
            s['scene'] = (i % 9) + 1
            samples.append(pre(s))
    batch = mt_collate(samples)

    if with_dve:
        # synthetic per-segment embedding targets in the target
        # generator's output contract (LUT row j <-> index image value
        # j, 0 = void; data/preprocessing/dense_visual_embedding.py),
        # padded host-side to (B, L+1, D) for the jitted step
        from nicr_mtsa_tpu.tasks.dense_visual_embedding import (
            pad_embedding_luts,
        )
        pan = np.asarray(batch['panoptic'])
        luts, idx_imgs = [], []
        for b in range(B):
            ids = np.unique(pan[b])
            ids = ids[ids != 0]
            luts.append(_unit_rows(len(ids), embedding_dim))
            index_img = np.zeros(pan[b].shape, np.int32)
            for j, sid in enumerate(ids, start=1):
                index_img[pan[b] == sid] = j
            idx_imgs.append(index_img)
        batch['dense_visual_embedding_lut'] = pad_embedding_luts(
            luts, embedding_dim)
        batch['dense_visual_embedding_indices'] = np.stack(idx_imgs)

    static_batch = {
        APPLIED_PREPROCESSING_KEY: batch[APPLIED_PREPROCESSING_KEY],
    }
    # metric-only epoch: return no prediction keys so XLA DCEs/fuses
    # the fullres per-task buffers into the metric reductions
    step = pipeline.make_fused_eval_step(static_batch, output_keys=())
    arrays = jax.tree_util.tree_map(jax.device_put,
                                    strip_non_arrays(batch))
    jax.block_until_ready(arrays)
    states = {name: helper.empty_metric_states()
              for name, helper in pipeline.task_helpers.items()
              if hasattr(helper, 'empty_metric_states')}

    state = pipeline.create_train_state(
        jax.random.PRNGKey(0), pipeline.model_inputs(arrays))
    try:
        _, _, states = step(state['params'], state['batch_stats'],
                            arrays, states)              # compile
        float(np.asarray(states['semantic']).sum())
    except Exception as e:
        if 'RESOURCE_EXHAUSTED' in str(e) or 'memory' in str(e).lower():
            print(f'# OOM detail: {str(e)[:1200]}', file=sys.stderr)
            sys.exit(
                f'eval batch {B} exceeds single-chip HBM for the full '
                'fused program (model + logits + metric states). '
                'Measured-supported batches: any multiple of 8 up to '
                '128, and 256; B128 (default) and B256 are the '
                'recommended points. B192 specifically OOMs: its '
                'remainder chunk adds XLA phase-chain temporaries on '
                'top of a B256-equivalent footprint (PERF.md '
                'batch-size boundaries).')
        raise

    # scalar fetch, not block_until_ready (see train bench comment)
    iters = 3 if args.quick else args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        _, losses, states = step(state['params'], state['batch_stats'],
                                 arrays, states)
    float(np.asarray(states['semantic'][0, 0]))
    dt = time.perf_counter() - t0
    fps = B * iters / dt

    if getattr(args, 'dataset', None):
        # report the real-data metric values accumulated on device
        # (each eval step re-counts the same batch `iters + 1` times;
        # mIoU/PQ are ratios, so repetition cancels out)
        for name, helper in pipeline.task_helpers.items():
            if name in states and hasattr(helper, 'load_metric_states'):
                helper.load_metric_states(states[name])
                _, _, logs = helper.validation_epoch_end()
                for k, v in sorted(logs.items()):
                    print(f'# {k}: {float(v):.4f}', file=sys.stderr)

    if not emit:
        return fps
    print(json.dumps({
        'metric': 'multitask_eval_frames_per_sec_per_chip_640x480'
                  if not args.quick else
                  'multitask_eval_frames_per_sec_per_chip_quick',
        'value': round(fps, 2),
        'unit': 'frames/s/chip',
        'vs_baseline': round(fps / 625.0, 4),
    }))
    return fps


def run_stream_bench(args, pipe, model, H, W, rng):
    """Sustained serving throughput with FRESH host frames every step:
    uint8 batches flow through `prefetch_to_device` (double-buffered
    async host->device DMA) into the fused serving program, so the
    number includes the input-feed cost a deployment pays (the
    device-resident throughput mode amortizes it away). On the axon
    tunnel the H2D path crosses a network hop, so treat this as a
    lower bound for directly-attached hosts."""
    import jax

    from nicr_mtsa_tpu.data import prefetch_to_device

    B = args.batch_size or (2 if args.quick else 256)
    iters = 3 if args.quick else args.iters
    # a small rotation of distinct host batches (pre-generated so RNG
    # cost stays out of the loop) — enough that no transfer is ever
    # satisfied from a device-side cache of the previous step
    n_distinct = min(iters, 4)
    host_batches = []
    for _ in range(n_distinct):
        host_batches.append((
            rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
            rng.integers(0, 2 ** 14, (B, H, W), dtype=np.uint16),
        ))

    inputs = pipe.preprocess(jax.device_put(host_batches[0][0]),
                             jax.device_put(host_batches[0][1]))
    variables = jax.jit(
        lambda k: model.init({'params': k}, inputs, train=False)
    )(jax.random.PRNGKey(0))
    out = pipe(variables, *map(jax.device_put, host_batches[0]))
    int(np.asarray(out['panoptic'][0, 0, 0]))      # compile + fence

    def gen():
        for i in range(iters):
            yield host_batches[i % n_distinct]

    t0 = time.perf_counter()
    for rgb_d, depth_d in prefetch_to_device(gen(), size=2):
        out = pipe(variables, rgb_d, depth_d)
    int(np.asarray(out['panoptic'][0, 0, 0]))      # scalar-fetch sync
    dt = time.perf_counter() - t0
    fps = B * iters / dt
    print(json.dumps({
        'metric': 'panoptic_streaming_frames_per_sec_per_chip_640x480'
                  if not args.quick else
                  'panoptic_streaming_frames_per_sec_per_chip_quick',
        'value': round(fps, 2),
        'unit': 'frames/s/chip',
        'vs_baseline': round(fps / 625.0, 4),
    }))


def run_latency_bench(args, pipe, model, H, W, rng):
    """Per-frame serving latency at small batches: each step is
    individually fenced with a device->host scalar fetch, so the
    reported number is true end-to-end step latency (the deployment
    question the reference answers with Jetson+TensorRT numbers),
    not amortized throughput."""
    import jax
    import jax.numpy as jnp

    iters = 3 if args.quick else max(args.iters, 30)
    rows = {}
    for bs in ([2] if args.quick else [1, 8]):
        rgb = jnp.asarray(rng.integers(
            0, 255, (bs, H, W, 3), dtype=np.uint8))
        depth = jnp.asarray(rng.integers(
            0, 2 ** 14, (bs, H, W), dtype=np.uint16))
        inputs = pipe.preprocess(rgb, depth)
        variables = jax.jit(
            lambda k: model.init({'params': k}, inputs, train=False)
        )(jax.random.PRNGKey(0))
        out = pipe(variables, rgb, depth)          # compile
        int(np.asarray(out['panoptic'][0, 0, 0]))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = pipe(variables, rgb, depth)
            int(np.asarray(out['panoptic'][0, 0, 0]))
            times.append(time.perf_counter() - t0)
        ms = 1000.0 * float(np.median(times))
        rows[bs] = ms
        print(f'# B{bs}: median {ms:.2f} ms/step '
              f'({1000.0 * bs / ms:.1f} frames/s)', file=sys.stderr)
    key = min(rows)
    print(json.dumps({
        'metric': f'panoptic_inference_latency_ms_b{key}_640x480',
        'value': round(rows[key], 2),
        'unit': 'ms/step',
        'vs_baseline': 0.0,     # no latency baseline published
    }))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--quick', action='store_true',
                        help='tiny model + few iters (smoke test)')
    parser.add_argument('--batch-size', type=int, default=0,
                        help='0 = the known-good default (256); use '
                             '--sweep for a batch-size sweep')
    parser.add_argument('--sweep', action='store_true',
                        help='sweep batch sizes {64, 128, 256}')
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--train', action='store_true',
                        help='measure multi-task TRAIN step throughput '
                             'instead of inference')
    parser.add_argument('--eval', action='store_true',
                        help='measure fused EVAL step throughput '
                             '(forward + postproc + merge + PQ/mIoU/MAE '
                             'metric states on device). Batch sizes: '
                             'any multiple of 8 runs the fused '
                             'crop+resize+argmax kernel (B128/B256 '
                             'measured best); other batches fall back '
                             'to the XLA phase chain, which OOMs at '
                             'large B')
    parser.add_argument('--stream', action='store_true',
                        help='measure serving throughput with fresh '
                             'host frames each step (double-buffered '
                             'async H2D via data.prefetch_to_device) '
                             'instead of a device-resident batch')
    parser.add_argument('--latency', action='store_true',
                        help='measure per-frame serving LATENCY at '
                             'small batches (1, 8) instead of '
                             'throughput: median ms per step')
    parser.add_argument('--model', default='emsanet-bench',
                        help="'emsanet-bench' (the default flagship "
                             "wiring) or a configs.BENCH_CONFIGS "
                             "preset name (e.g. 'emsaformer_dve')")
    parser.add_argument('--defer4x', action='store_true', default=True,
                        help='serving: defer BOTH semantic prediction '
                             'upsamplings into the fused 4x finisher '
                             '(ops/pallas/semantic_finisher4x.py). '
                             'Default since the on-chip f64-oracle '
                             'exactness gate passed (scripts/'
                             'finisher4x_exact.py)')
    parser.add_argument('--no-defer4x', dest='defer4x',
                        action='store_false',
                        help='serving: use the single-stage fused '
                             'finisher (final upsample only) instead '
                             'of the 4x finisher')
    parser.add_argument('--mu-bf16', action='store_true',
                        help='--train only: store the AdamW first '
                             'moment in bfloat16 (halves the larger '
                             'optimizer buffer; lifts the B128+remat '
                             'activation ceiling)')
    parser.add_argument('--segment-table-size', type=int, default=128,
                        help='--eval only: GT panoptic segment-table '
                             'capacity (PQ gt slots). The 128 default '
                             'holds 2x+ headroom over NYUv2/SUNRGBD '
                             'segment counts (preprocessing records '
                             'overflow if an image ever exceeds it); '
                             'pass 256 for hypersim-scale images '
                             '(costs ~5% eval throughput in the PQ '
                             'intersections/slot maps)')
    parser.add_argument('--dataset', default='',
                        help='--eval only: path to a directory dataset '
                             '(nicr_mtsa_tpu/data/dataset.py layout); '
                             'evaluates real samples and reports the '
                             'accumulated mIoU/PQ values')
    parser.add_argument('--dataset-split', default='valid')
    parser.add_argument('--attn-qkv', action='store_true',
                        help='serving: fused-qkv window attention '
                             '(slicing + v2 normalize/scale inside the '
                             'kernel; forward-only)')
    parser.add_argument('--attn-block', action='store_true',
                        help='serving: whole-sub-block window '
                             'attention kernel (qkv GEMM + v2 norm + '
                             'attention + output projection in VMEM; '
                             'kills the q/k/v/proj relayout copies; '
                             'forward-only)')
    parser.add_argument('--remat', action='store_true',
                        help='gradient-checkpoint backbone blocks (Swin '
                             'AND ResNet/NBt1D) + dense decoder blocks '
                             '(recompute in backward; lifts the '
                             'train-batch activation ceiling, parameter '
                             'tree unchanged)')
    parser.add_argument('--attn-chunk', type=int, default=0,
                        help='images per Swin window-attention chunk '
                             '(0 = whole batch); bounds attention '
                             'memory for big serve batches')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from nicr_mtsa_tpu.models.multi_task import (
        MultiTaskModelConfig, build_model,
    )
    from nicr_mtsa_tpu.pipeline import PanopticInferencePipeline
    from nicr_mtsa_tpu.postprocessing import (
        InstancePostprocessing, PanopticPostprocessing,
        SemanticPostprocessing,
    )

    H, W = (128, 160) if args.quick else (480, 640)
    n_classes = 40                        # NYUv2-40, without void
    is_thing = tuple(i < 8 for i in range(n_classes))   # 8 thing classes

    if args.dataset:
        # real data: the dataset's class inventory drives the model
        # heads and metric tables
        from nicr_mtsa_tpu.data.dataset import DirectoryRGBDDataset
        if not DirectoryRGBDDataset.is_available(args.dataset):
            sys.exit(f'--dataset: no dataset at {args.dataset!r} '
                     '(missing meta.json)')
        ds_cfg = DirectoryRGBDDataset(
            args.dataset, split=args.dataset_split,
            sample_keys=('rgb',)).config
        without_void = ds_cfg.semantic_label_list_without_void
        n_classes = len(without_void)
        is_thing = without_void.classes_is_thing

    if args.model == 'emsanet-bench':
        import dataclasses
        config = MultiTaskModelConfig(
            tasks=('semantic', 'instance', 'orientation', 'scene'),
            backbone_rgb='resnet18' if args.quick else 'resnet34',
            backbone_depth='resnet18' if args.quick else 'resnet34',
            resnet_block='basicblock' if args.quick else 'nonbottleneck1d',
            context_n_channels=128 if args.quick else 512,
            decoder_n_channels=(64, 48, 32) if args.quick
            else (512, 256, 128),
            decoder_n_blocks=1 if args.quick else 3,
            input_size=(H, W),
            semantic_n_classes=n_classes,
            scene_n_classes=10,
            upsampling='learned-3x3-zeropad',
            prediction_upsampling='learned-3x3-zeropad',
            # serving: fuse the final semantic upsample with
            # argmax/score (ops/pallas/semantic_finisher.py) -- the
            # (B, 480, 640, 40) logits tensor never touches HBM.
            # Eval/metric runs stay on the non-deferred reduce so
            # reported mIoU/PQ are bit-identical to the standard
            # model (deferred kernel may flip <0.5% bf16 tie pixels)
            defer_semantic_prediction_upsampling=(
                ('all' if args.defer4x else True)
                if (not args.train and not args.eval) else False),
            dtype=jnp.bfloat16,
        )
        if args.remat:
            # CNN remat: encoder NBt1D/residual blocks + dense decoder
            # blocks recompute in the backward pass (lifts the train
            # activation ceiling; B96 OOMed by 4.8G without it)
            config = dataclasses.replace(
                config, backbone_remat=True, decoder_remat=True)
    else:
        import dataclasses
        from nicr_mtsa_tpu.configs import BENCH_CONFIGS
        config = BENCH_CONFIGS[args.model](
            input_size=(H, W), dtype=jnp.bfloat16)
        if (not args.train and not args.eval
                and config.prediction_upsampling == 'learned-3x3-zeropad'):
            config = dataclasses.replace(
                config, defer_semantic_prediction_upsampling=(
                    'all' if args.defer4x else True))
        elif (not args.train and not args.eval and args.defer4x
                and config.prediction_upsampling == 'bilinear'):
            # MLP-decoder families (EMSAFormer): fused bilinear 4x
            # finisher (only the two-stage deferral exists here)
            config = dataclasses.replace(
                config, defer_semantic_prediction_upsampling='all')
        if args.attn_chunk and config.backbone_rgbd \
                and config.backbone_rgbd.startswith('swin'):
            config = dataclasses.replace(
                config, backbone_attn_chunk_size=args.attn_chunk)
        if args.remat:
            config = dataclasses.replace(config, backbone_remat=True)
            if config.decoder_type == 'dense':
                config = dataclasses.replace(config, decoder_remat=True)
        if args.attn_qkv and not args.train and not args.eval \
                and config.backbone_rgbd \
                and config.backbone_rgbd.startswith('swin'):
            config = dataclasses.replace(
                config, backbone_attn_backend='pallas-qkv')
        if args.attn_block and not args.train and not args.eval \
                and config.backbone_rgbd \
                and config.backbone_rgbd.startswith('swin'):
            config = dataclasses.replace(
                config, backbone_attn_backend='pallas-block')
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

    if args.train:
        run_train_bench(args, model, H, W, n_classes, is_thing, rng)
        return
    if args.eval:
        run_eval_bench(args, model, H, W, n_classes, is_thing,
                       config=config)
        return
    if args.latency:
        run_latency_bench(args, pipe, model, H, W, rng)
        return
    if args.stream:
        run_stream_bench(args, pipe, model, H, W, rng)
        return

    def run(batch_size, iters):
        rgb = jnp.asarray(rng.integers(
            0, 255, (batch_size, H, W, 3), dtype=np.uint8))
        depth = jnp.asarray(rng.integers(
            0, 2 ** 14, (batch_size, H, W), dtype=np.uint16))

        inputs = pipe.preprocess(rgb, depth)
        variables = jax.jit(
            lambda k: model.init({'params': k}, inputs, train=False)
        )(jax.random.PRNGKey(0))

        # warmup / compile
        out = pipe(variables, rgb, depth)
        jax.block_until_ready(out)

        # scalar fetch, not block_until_ready (see train bench comment)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe(variables, rgb, depth)
        int(np.asarray(out['panoptic'][0, 0, 0]))
        dt = time.perf_counter() - t0
        return batch_size * iters / dt

    iters = 3 if args.quick else args.iters
    if args.batch_size:
        sizes = [args.batch_size]
    elif args.quick:
        sizes = [2]
    elif args.sweep:
        sizes = [64, 128, 256]
    else:
        # single compile keeps the driver's bench run fast; 256 is the
        # EMSANet throughput sweet spot; windowed-attention models
        # peak at 128 (B256 OOMs on attention activations) -- PERF.md
        swin = args.model != 'emsanet-bench' and 'former' in args.model
        sizes = [128] if swin else [256]

    def measure_all():
        best = 0.0
        for bs in sizes:
            try:
                fps = run(bs, iters)
            except Exception as e:  # OOM at large batch etc.
                print(f'# batch {bs} failed: {type(e).__name__}: {e}',
                      file=sys.stderr)
                continue
            print(f'# batch {bs}: {fps:.1f} frames/s', file=sys.stderr)
            best = max(best, fps)
        return best

    best = measure_all()
    if best == 0.0 and not args.cpu:
        # a freshly-restarted TPU worker can fail the first program
        # transiently; re-probe the chip with a trivial op and retry
        # once rather than reporting 0
        print('# all sizes failed; re-probing chip and retrying once',
              file=sys.stderr)
        time.sleep(30)
        try:
            jax.block_until_ready(jnp.ones((8, 8)).sum())
        except Exception as e:
            print(f'# chip probe failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
        else:
            best = measure_all()

    result = {
        'metric': 'panoptic_inference_frames_per_sec_per_chip_640x480'
                  if not args.quick else
                  'panoptic_inference_frames_per_sec_per_chip_quick',
        'value': round(best, 2),
        'unit': 'frames/s/chip',
        # north star: 5000 frames/s on v5e-8 => 625 per chip
        'vs_baseline': round(best / 625.0, 4),
    }
    if args.model == 'emsanet-bench':
        # the driver-visible line must carry the north-star-COMPLETE
        # number too (forward + postproc + merge + metric states; the
        # serving path alone omits the metric machinery the north star
        # includes -- round-4 verdict item 8). Run it in a CLEAN
        # subprocess: in-process after the serving phase the same eval
        # program measures ~38% slower (375 -> 232 f/s, reproduced
        # twice -- device-client residue from the serving programs),
        # while a fresh process reproduces the standalone number.
        import os
        import subprocess
        try:
            cmd = [sys.executable, os.path.abspath(__file__), '--eval',
                   '--iters', str(args.iters),
                   '--segment-table-size', str(args.segment_table_size)]
            if args.quick:
                cmd.append('--quick')
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=2100)
            line = [l for l in res.stdout.splitlines()
                    if l.startswith('{')][-1]
            d = json.loads(line)
            result['eval_value'] = d['value']
            result['eval_vs_baseline'] = d['vs_baseline']
        except (Exception, SystemExit) as e:
            print(f'# eval extra failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
            result['eval_value'] = 0.0
            result['eval_vs_baseline'] = 0.0
    print(json.dumps(result))


if __name__ == '__main__':
    main()
