"""Measure numerical parity against the ACTUAL reference
implementation (imported from /root/reference/src) and against inline
torch twins for the weight-port path, printing max-abs-diffs for
PARITY.md. Runs on CPU.

    JAX_PLATFORMS=cpu python scripts/parity_report.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

import jax  # noqa: E402

# the ambient env pins JAX_PLATFORMS=axon (TPU); parity numbers must
# come from the f32 CPU backend, not bf16-pass TPU matmuls
jax.config.update('jax_platforms', 'cpu')

import numpy as np                                    # noqa: E402
import torch                                          # noqa: E402

from test_reference_golden import (                   # noqa: E402
    _random_panoptic_inputs, _t, ref_import,
)


def report(name, diff):
    print(f'{name:55s} max|diff| = {diff:.3g}')


def main():
    rows = []

    # --- losses -----------------------------------------------------------
    ref_ce = ref_import('loss.ce')
    from nicr_mtsa_tpu.losses import (
        CosineEmbeddingLoss, CrossEntropyLossSemantic, L1Loss, MSELoss,
        VonMisesLossBiternion,
    )
    rng = np.random.default_rng(0)
    B, C, H, W = 2, 7, 9, 11
    logits = rng.normal(size=(B, C, H, W)).astype(np.float32)
    target = rng.integers(0, C + 1, size=(B, H, W))
    weights = rng.uniform(0.5, 2.0, size=C).astype(np.float32)
    worst = 0.0
    for w, wr, ls in [(None, False, 0.0), (weights, False, 0.0),
                      (weights, True, 0.0), (None, False, 0.1)]:
        r, _ = ref_ce.CrossEntropyLossSemantic(
            weights=None if w is None else _t(w),
            label_smoothing=ls, weighted_reduction=wr)._compute_loss(
                _t(logits), _t(target))
        j, _ = CrossEntropyLossSemantic(
            weights=w, label_smoothing=ls,
            weighted_reduction=wr)._compute_loss(
                logits.transpose(0, 2, 3, 1), target)
        worst = max(worst, abs(float(j) - float(r)))
    report('CrossEntropyLossSemantic (4 weighting modes)', worst)

    x = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    y = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    worst = 0.0
    for kind, cls in [('l1', L1Loss), ('mse', MSELoss)]:
        mod = ref_import(f'loss.{kind}')
        rcls = mod.L1Loss if kind == 'l1' else mod.MSELoss
        for red in ('sum', 'mean'):
            r, _ = rcls(reduction=red)._compute_loss(_t(x), _t(y))
            j, _ = cls(reduction=red)._compute_loss(
                x.transpose(0, 2, 3, 1), y.transpose(0, 2, 3, 1))
            worst = max(worst, abs(float(j) - float(r)))
    report('L1Loss / MSELoss (sum, mean)', worst)

    ref_vm = ref_import('loss.vonmises')
    ang = rng.uniform(-np.pi, np.pi, (2, 37))
    xb = np.stack([np.cos(ang[0]), np.sin(ang[0])], -1).astype(np.float32)
    yb = np.stack([np.cos(ang[1]), np.sin(ang[1])], -1).astype(np.float32)
    worst = 0.0
    for kappa in (0.5, 1.0, 2.0):
        r, _ = ref_vm.VonMisesLossBiternion(kappa=kappa)._compute_loss(
            _t(xb), _t(yb))
        j, _ = VonMisesLossBiternion(kappa=kappa)._compute_loss(xb, yb)
        worst = max(worst, abs(float(j) - float(r)))
    report('VonMisesLossBiternion (kappa 0.5/1/2)', worst)

    ref_cos = ref_import('loss.cos_emb')
    e1 = rng.normal(size=(23, 16)).astype(np.float32)
    e2 = rng.normal(size=(23, 16)).astype(np.float32)
    worst = 0.0
    for red in ('sum', 'mean'):
        r, _ = ref_cos.CosineEmbeddingLoss(
            reduction=red)._compute_loss(_t(e1), _t(e2))
        j, _ = CosineEmbeddingLoss(reduction=red)._compute_loss(e1, e2)
        worst = max(worst, abs(float(j) - float(r)))
    report('CosineEmbeddingLoss (sum, mean)', worst)

    # --- panoptic merge ---------------------------------------------------
    ref_merge = ref_import('utils.panoptic_merge')
    from nicr_mtsa_tpu.ops.merge_np import (
        deeplab_merge_batch_np, naive_merge_semantic_and_instance_np,
    )
    thing_ids = [1, 2, 3]
    mismatch = 0
    for seed in range(5):
        sem, ins = _random_panoptic_inputs(seed)
        fg = np.isin(sem, thing_ids)
        rp, _ = ref_merge.deeplab_merge_batch(
            _t(sem.astype(np.int64)), _t(ins.astype(np.int64)), _t(fg),
            1 << 16, thing_ids, 0)
        mp, _ = deeplab_merge_batch_np(
            sem.astype(np.uint16), ins.astype(np.uint16), fg,
            1 << 16, thing_ids, 0)
        mismatch += int((mp.astype(np.int64) != rp.numpy()).sum())
    report('deeplab_merge_batch (5 seeds, mismatched px)', mismatch)

    mismatch = 0
    for seed in range(5):
        sem, ins = _random_panoptic_inputs(seed, B=1)
        rp, _ = ref_merge.naive_merge_semantic_and_instance_np(
            sem[0].astype(np.uint16), ins[0].astype(np.uint16),
            1 << 16, [1, 2, 3, 4], 0)
        mp, _ = naive_merge_semantic_and_instance_np(
            sem[0].astype(np.uint16), ins[0].astype(np.uint16),
            1 << 16, [1, 2, 3, 4], 0)
        mismatch += int((mp.astype(np.int64) != np.asarray(rp)).sum())
    report('naive_merge (5 seeds, mismatched px)', mismatch)

    # --- PQ states --------------------------------------------------------
    ref_pq = ref_import('metric.pq')
    from nicr_mtsa_tpu.metrics.pq import PanopticQuality
    M = 1 << 16
    num_categories = 8
    worst = 0.0
    for seed in range(4):
        sg, ig = _random_panoptic_inputs(seed, B=2)
        sp, ip = _random_panoptic_inputs(seed + 100, B=2)
        pg, _ = deeplab_merge_batch_np(
            sg.astype(np.uint16), ig.astype(np.uint16),
            np.isin(sg, thing_ids), M, thing_ids, 0)
        pp, _ = deeplab_merge_batch_np(
            sp.astype(np.uint16), ip.astype(np.uint16),
            np.isin(sp, thing_ids), M, thing_ids, 0)
        ref_states = [np.zeros(num_categories, np.float64)
                      for _ in range(4)]
        for p, t in zip(pp, pg):
            iou, tp, fn, fp, _ = ref_pq.compare_and_accumulate(
                _t(p.astype(np.int64)), _t(t.astype(np.int64)),
                num_categories, 0, M, 256 ** 3, 0)
            for s, v in zip(ref_states, (iou, tp, fn, fp)):
                s += v.numpy()
        metric = PanopticQuality(
            num_categories=num_categories, ignored_label=0,
            max_instances_per_category=M,
            is_thing=[c in thing_ids for c in range(num_categories)])
        st = metric.update_state(
            metric.empty_state(), preds=pp.astype(np.int64),
            targets=pg.astype(np.int64))
        for name, rv in zip(('iou', 'tp', 'fn', 'fp'), ref_states):
            worst = max(worst, float(np.max(np.abs(
                np.asarray(st[f'{name}_per_class'], np.float64) - rv))))
    report('PQ per-class IoU/TP/FN/FP states (4 seeds)', worst)

    # --- Swin weight-port forward parity ----------------------------------
    from test_torch_port import _TorchSwin
    from nicr_mtsa_tpu.models.backbones.swin import SwinBackbone
    from nicr_mtsa_tpu.utils.torch_port import port_swin_state_dict
    import jax.numpy as jnp

    torch.manual_seed(0)
    depths, heads, embed, ws = (1, 2, 1, 1), (2, 4, 8, 16), 16, 7
    tmodel = _TorchSwin(embed=embed, heads=heads, ws=ws,
                        depths=depths).eval()
    variables = port_swin_state_dict(tmodel.state_dict(), depths=depths)
    jmodel = SwinBackbone(embed_dim=embed, depths=depths, n_heads=heads,
                          window_size=ws, stochastic_depth=0.0)
    xs = np.random.default_rng(0).normal(size=(2, 112, 140, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        t_outs = tmodel(torch.tensor(xs.transpose(0, 3, 1, 2)))
    j_outs = jmodel.apply({'params': variables['params']},
                          jnp.asarray(xs), train=False)
    worst = max(float(np.max(np.abs(np.asarray(j) - t.numpy())))
                for j, t in zip(j_outs, t_outs))
    worst_rel = max(
        float(np.max(np.abs(np.asarray(j) - t.numpy())
                     / (np.abs(t.numpy()) + 1.0)))
        for j, t in zip(j_outs, t_outs))
    report('Swin v1 ported-weights forward (5 stages, 112x140)', worst)
    report('  same, relative to |ref|+1', worst_rel)

    # --- ResNet weight-port forward parity --------------------------------
    try:
        from test_torch_port import _build_torch_resnet18
        has_resnet = True
    except ImportError:
        has_resnet = False
    if has_resnet:
        pass   # covered in tests/test_torch_port.py::test_resnet_port

    # --- full golden suite -------------------------------------------------
    # the complete direct-reference evidence lives in the golden test
    # files (preprocessing, postprocessing, task helpers, metrics,
    # infra); run them all and report the count
    print()
    print('running the full reference-golden suite '
          '(tests/test_reference_golden*.py) ...')
    import subprocess
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', '-q',
         os.path.join(REPO, 'tests', 'test_reference_golden.py'),
         os.path.join(REPO, 'tests', 'test_reference_golden_preproc.py'),
         os.path.join(REPO, 'tests', 'test_reference_golden_postproc.py'),
         os.path.join(REPO, 'tests', 'test_reference_golden_infra.py')],
        capture_output=True, text=True)
    print(proc.stdout.strip().splitlines()[-1])
    if proc.returncode:
        print(proc.stdout[-2000:])
        sys.exit(proc.returncode)


if __name__ == '__main__':
    main()
