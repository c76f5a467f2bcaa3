"""Window-attention kernel tile sweep on real hardware.

Times the fused kernel standalone at EMSAFormer stage shapes for a few
window-tile sizes T, with the honest device->host scalar-fetch sync
(block_until_ready lies through the axon tunnel, PERF.md). Standalone
numbers only rank candidates -- confirm the winner in the full serving
program (PERF.md lesson 3).

    python scripts/tune_attention.py [--batch 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


STAGES = [
    # (name, nWh, nWw, C, h)  at 480x640, v2 win 8
    ('stage1', 15, 20, 128, 4),
    ('stage2', 8, 10, 256, 8),
    ('stage3', 4, 5, 512, 16),
    ('stage4', 2, 3, 1024, 32),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--tiles', type=int, nargs='*', default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from nicr_mtsa_tpu.ops.pallas.window_attention import (
        _attention_call, build_bias_pair, build_pattern_pairs,
        pick_tile_windows,
    )

    rng = np.random.default_rng(0)
    for name, nWh, nWw, C, h in STAGES:
        nW = nWh * nWw
        Bw = args.batch * nW
        q, k, v = (jnp.asarray(
            rng.normal(size=(Bw, 64, C)).astype(np.float32) * 0.2,
            jnp.bfloat16) for _ in range(3))
        bias = jnp.asarray(
            rng.normal(size=(h, 64, 64)).astype(np.float32))
        bias_pair = build_bias_pair(bias)
        patterns = jnp.asarray(build_pattern_pairs(64, None, (1, 1)))

        default_t = pick_tile_windows(Bw, C)
        tiles = args.tiles or sorted({t for t in (2, 4, 8, 16, 32)
                                      if Bw % t == 0})
        for T in tiles:
            try:
                out = _attention_call(q, k, v, bias_pair, patterns, h,
                                      (1, 1), T, False)
                float(jnp.asarray(out[0, 0, 0], jnp.float32))  # compile
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = _attention_call(q, k, v, bias_pair, patterns,
                                          h, (1, 1), T, False)
                float(jnp.asarray(out[0, 0, 0], jnp.float32))
                dt = (time.perf_counter() - t0) / args.iters
                mark = ' <- default' if T == default_t else ''
                print(f'{name} C={C} h={h} Bw={Bw} T={T}: '
                      f'{dt * 1e3:.2f} ms{mark}', flush=True)
            except Exception as e:
                print(f'{name} T={T}: FAILED {type(e).__name__}: '
                      f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
