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
        # pure remainder block (no 128 prefix)
        (64, 60, 80, 40, (slice(0, 48), slice(0, 80)), 96, 96),
    ]
    if args.big:
        cases.append(
            (192, 480, 640, 40, (slice(0, 480), slice(0, 640)),
             512, 512))

    for (B, H, W, C, crop, oh, ow) in cases:
        rng = np.random.default_rng(B)
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        assert resize_reduce_supported(x.shape, crop, oh, ow), \
            (B, H, W, C)
        idx, score = crop_resize_argmax_score(x, crop, oh, ow)
        cropped = x[:, crop[0], crop[1], :]
        score_r, idx_r = resized_channel_reduce(
            cropped, oh, ow, semantic_score_idx)
        idx, score = np.asarray(idx), np.asarray(score)
        idx_r, score_r = np.asarray(idx_r), np.asarray(score_r)
        mism = int((idx != idx_r).sum())
        sdiff = float(np.abs(score - score_r).max())
        print(f'B{B} ({H}x{W}->{oh}x{ow}): argmax mismatches '
              f'{mism}/{idx.size}, score maxdiff {sdiff:.2e}')
        assert mism == 0, 'argmax must be bit-identical'
        assert sdiff < 5e-6
    print('chunked resize_reduce: exact on hardware')


if __name__ == '__main__':
    main()
