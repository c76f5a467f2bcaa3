"""Hardware exactness check for the CHUNKED-batch resize_reduce path
(B = 128k + r): kernel vs the XLA twin, argmax must be bit-identical
(see tests/test_resize_reduce.py for the interpret-mode twin tests).

    python scripts/resize_reduce_exact_hw.py [--big]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--big', action='store_true',
                        help='also run the bench-shaped B192 case')
    args = parser.parse_args()

    import jax.numpy as jnp
    from nicr_mtsa_tpu.models.upsampling import resized_channel_reduce
    from nicr_mtsa_tpu.ops.pallas.resize_reduce import (
        crop_resize_argmax_score, resize_reduce_supported,
    )
    from nicr_mtsa_tpu.ops.pallas.semantic_reduce import (
        semantic_score_idx,
    )

    cases = [
        # chunked: 128 + 8 remainder
        (136, 60, 80, 40, (slice(0, 60), slice(0, 80)), 64, 64),
        # pure remainder block (no 128 prefix), non-trivial crop
        (64, 60, 80, 40, (slice(0, 56), slice(0, 80)), 64, 64),
    ]
    if args.big:
        cases.append(
            (192, 480, 640, 40, (slice(0, 480), slice(0, 640)),
             512, 512))

    for (B, H, W, C, crop, oh, ow) in cases:
        rng = np.random.default_rng(B)
        # bench-shaped case runs bf16 like the real eval program (a
        # standalone f32 input + remainder pad would exceed HBM)
        dt = jnp.bfloat16 if H >= 480 else jnp.float32
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)
                        ).astype(dt)
        assert resize_reduce_supported(x.shape, crop, oh, ow), \
            (B, H, W, C)
        idx, score = crop_resize_argmax_score(x, crop, oh, ow)
        idx, score = np.asarray(idx), np.asarray(score)
        # the XLA twin's phase-chain temporaries OOM at B192 f32 in a
        # standalone program; run it in 64-image slices
        idx_r = np.empty_like(idx)
        score_r = np.empty_like(score)
        for s in range(0, B, 64):
            cropped = x[s:s + 64, crop[0], crop[1], :]
            sc, ix = resized_channel_reduce(
                cropped, oh, ow, semantic_score_idx)
            idx_r[s:s + 64] = np.asarray(ix)
            score_r[s:s + 64] = np.asarray(sc)
        mism = int((idx != idx_r).sum())
        sdiff = float(np.abs(score - score_r).max())
        print(f'B{B} ({H}x{W}->{oh}x{ow}): argmax mismatches '
              f'{mism}/{idx.size}, score maxdiff {sdiff:.2e}')
        assert mism == 0, 'argmax must be bit-identical'
        # the TPU's exp/div rounding differs from the XLA twin's
        # exp(max - logsumexp) route by ~3e-5 on hardware (CPU
        # interpret agrees to 2e-6); argmax is the metric-bearing
        # output and must stay bit-exact
        assert sdiff < 1e-4
    print('chunked resize_reduce: exact on hardware')


if __name__ == '__main__':
    main()
