"""Extended fuzz of merge/PQ parity against the reference implementation.

Widens the per-commit golden tests (tests/test_reference_golden.py,
3-5 seeds) to hundreds of randomized cases across adversarial regimes:
zero instances, all-stuff scenes, dense instance packings, void-heavy
maps, non-contiguous instance ids, and larger resolutions. Compares

  1. deeplab panoptic merge maps + id dicts (ops/merge_np vs reference
     utils/panoptic_merge.py),
  2. naive merge maps + id dicts,
  3. PQ per-class IoU/TP/FN/FP states (metrics/pq.py vs reference
     metric/pq.py compare_and_accumulate)

and reports exact-match statistics. Run on CPU:

    python scripts/fuzz_reference_parity.py [--cases 40]

Results are recorded in PARITY.md ("Accuracy parity" section).
"""
import argparse
import os
import sys

import jax
import numpy as np

# host-side comparison: never touch the (possibly busy/absent) TPU;
# the ambient env pins JAX_PLATFORMS=axon, so force CPU here
jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def make_inputs(rng, regime, H, W, n_classes):
    """Random semantic/instance maps for one image under a regime."""
    semantic = rng.integers(0, n_classes, size=(H, W)).astype(np.int32)
    instance = np.zeros((H, W), np.int32)

    if regime == 'no_instances':
        return semantic, instance
    if regime == 'all_void':
        return np.zeros((H, W), np.int32), instance

    n_inst = {'sparse': 4, 'dense': 40, 'void_heavy': 6,
              'noncontig': 6, 'large': 12}[regime]
    next_id = 1
    for _ in range(n_inst):
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        hh = rng.integers(2, max(3, H // 3))
        ww = rng.integers(2, max(3, W // 3))
        sl = (slice(max(0, cy - hh // 2), min(H, cy + hh // 2 + 1)),
              slice(max(0, cx - ww // 2), min(W, cx + ww // 2 + 1)))
        instance[sl] = next_id
        semantic[sl] = rng.integers(1, n_classes)
        next_id += rng.integers(1, 40) if regime == 'noncontig' else 1
    if regime == 'void_heavy':
        semantic[rng.random((H, W)) < 0.6] = 0
    return semantic, instance


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cases', type=int, default=40,
                        help='random cases per regime')
    args = parser.parse_args()

    from test_reference_golden import ref_import, _t
    ref_merge = ref_import('utils.panoptic_merge')
    ref_pq = ref_import('metric.pq')
    from nicr_mtsa_tpu.ops.merge_np import (
        deeplab_merge_batch_np, naive_merge_semantic_and_instance_np,
    )
    from nicr_mtsa_tpu.metrics.pq import PanopticQuality

    M = 1 << 16
    regimes = ('sparse', 'dense', 'no_instances', 'all_void',
               'void_heavy', 'noncontig', 'large')
    totals = {'merge': 0, 'naive': 0, 'pq': 0}
    failures = []

    for regime in regimes:
        for case in range(args.cases):
            rng = np.random.default_rng(hash((regime, case)) % (2 ** 31))
            # bucketed shapes/classes: the device PQ jit-caches per
            # (shape, num_categories) combination
            H, W = (120, 160) if regime == 'large' else (
                (24, 32) if case % 2 else (40, 48))
            n_classes = 8 if case % 3 else 16
            thing_ids = sorted(rng.choice(
                np.arange(1, n_classes), size=min(3, n_classes - 1),
                replace=False).tolist())

            sem, ins = make_inputs(rng, regime, H, W, n_classes)
            sem2, ins2 = make_inputs(rng, regime, H, W, n_classes)
            fg = np.isin(sem, thing_ids)

            # 1. deeplab merge
            ref_pan, ref_dicts = ref_merge.deeplab_merge_batch(
                _t(sem[None].astype(np.int64)),
                _t(ins[None].astype(np.int64)),
                _t(fg[None]), M, thing_ids, 0)
            my_pan, my_dicts = deeplab_merge_batch_np(
                sem[None].astype(np.uint16), ins[None].astype(np.uint16),
                fg[None], M, thing_ids, 0)
            ok = (np.array_equal(my_pan.astype(np.int64),
                                 ref_pan.numpy().astype(np.int64))
                  and [{int(k): int(v) for k, v in d.items()}
                       for d in my_dicts]
                  == [{int(k): int(v) for k, v in d.items()}
                      for d in ref_dicts])
            totals['merge'] += 1
            if not ok:
                failures.append(('merge', regime, case))

            # 2. naive merge
            ref_n, ref_nd = ref_merge.naive_merge_semantic_and_instance_np(
                sem.astype(np.uint16), ins.astype(np.uint16), M,
                thing_ids, 0)
            my_n, my_nd = naive_merge_semantic_and_instance_np(
                sem.astype(np.uint16), ins.astype(np.uint16), M,
                thing_ids, 0)
            ok = (np.array_equal(my_n.astype(np.int64),
                                 np.asarray(ref_n).astype(np.int64))
                  and {int(k): int(v) for k, v in my_nd.items()}
                  == {int(k): int(v) for k, v in ref_nd.items()})
            totals['naive'] += 1
            if not ok:
                failures.append(('naive', regime, case))

            # 3. PQ states: pred = second random map merged
            pan_gt = my_pan
            pan_pred, _ = deeplab_merge_batch_np(
                sem2[None].astype(np.uint16), ins2[None].astype(np.uint16),
                np.isin(sem2, thing_ids)[None], M, thing_ids, 0)
            iou, tp, fn, fp, _ = ref_pq.compare_and_accumulate(
                _t(pan_pred[0].astype(np.int64)),
                _t(pan_gt[0].astype(np.int64)),
                n_classes, 0, M, 256 ** 3, 0)
            metric = PanopticQuality(
                num_categories=n_classes, ignored_label=0,
                max_instances_per_category=M,
                is_thing=[c in thing_ids for c in range(n_classes)])
            state = metric.update_state(
                metric.empty_state(),
                preds=pan_pred.astype(np.int64),
                targets=pan_gt.astype(np.int64))
            ok = all(
                np.allclose(np.asarray(state[f'{n}_per_class'], np.float64),
                            v.numpy(), atol=1e-6)
                for n, v in zip(('iou', 'tp', 'fn', 'fp'),
                                (iou, tp, fn, fp)))
            totals['pq'] += 1
            if not ok:
                failures.append(('pq', regime, case))
        print(f'{regime}: done', flush=True)

    print()
    for k, n in totals.items():
        nf = sum(1 for f in failures if f[0] == k)
        print(f'{k}: {n - nf}/{n} exact')
    if failures:
        print('FAILURES:', failures[:20])
        sys.exit(1)
    print('all exact')


if __name__ == '__main__':
    main()
