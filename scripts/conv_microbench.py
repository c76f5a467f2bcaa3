"""Microbenchmark the forward-restructuring candidates on real shapes
(PERF.md: the eval forward is 180 ms of generic conv fusions at 19.5%
MFU; no single op dominates, so gains must come from restructuring).

Candidates measured at the EMSANet hot shapes (B128, NBt1D stages):
1. separate rgb+depth convs vs ONE feature_group_count=2 conv
   (identical math, stacked weights) -- halves op count if XLA:TPU
   lowers grouped convs natively
2. (3,1)+ReLU+(1,3) NBt1D pair vs one fused 3x3 conv (NOT
   numerically equal -- sizes the ceiling of the inference-fusion
   candidate before any quality study)

Each timing jits a loop of `iters` applications with a scalar fetch
(tunnel-safe sync).

    python scripts/conv_microbench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    import jax.numpy as jnp

    B = 128
    iters = 20
    # (H, W, C) per encoder stage (R34-NBt1D at 480x640)
    shapes = [(120, 160, 64), (60, 80, 128), (30, 40, 256)]

    def timeit(fn, *args):
        # every variant returns a SCALAR (reduced in-program) so the
        # device->host fetch is 4 bytes -- fetching tensors through
        # the axon tunnel at ~40 MB/s poisons the timing
        out = fn(*args)
        float(np.asarray(out))
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(np.asarray(out))
        dt = (time.perf_counter() - t0) / iters * 1000
        return dt, s

    def conv(x, w, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=groups)

    rng = np.random.default_rng(0)
    for (H, W, C) in shapes:
        xr = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        xd = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        w31r = jnp.asarray(rng.normal(size=(3, 1, C, C)) * 0.05,
                           jnp.bfloat16)
        w31d = jnp.asarray(rng.normal(size=(3, 1, C, C)) * 0.05,
                           jnp.bfloat16)
        w13r = jnp.asarray(rng.normal(size=(1, 3, C, C)) * 0.05,
                           jnp.bfloat16)
        w13d = jnp.asarray(rng.normal(size=(1, 3, C, C)) * 0.05,
                           jnp.bfloat16)
        w33 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05,
                          jnp.bfloat16)

        @jax.jit
        def sep_pair(xr, xd):
            a, b = xr, xd
            for _ in range(iters):
                a = jax.nn.relu(conv(a, w31r))
                a = conv(a, w13r)
                b = jax.nn.relu(conv(b, w31d))
                b = conv(b, w13d)
            return (jnp.sum(a, dtype=jnp.float32)
                    + jnp.sum(b, dtype=jnp.float32))

        xg = jnp.concatenate([xr, xd], axis=-1)
        wg31 = jnp.concatenate([w31r, w31d], axis=-1)   # (3,1,C,2C)
        wg13 = jnp.concatenate([w13r, w13d], axis=-1)

        @jax.jit
        def grouped_pair(xg):
            a = xg
            for _ in range(iters):
                a = jax.nn.relu(conv(a, wg31, groups=2))
                a = conv(a, wg13, groups=2)
            return jnp.sum(a, dtype=jnp.float32)

        @jax.jit
        def sep_3x3(xr, xd):
            a, b = xr, xd
            for _ in range(iters):
                a = conv(a, w33)
                b = conv(b, w33)
            return (jnp.sum(a, dtype=jnp.float32)
                    + jnp.sum(b, dtype=jnp.float32))

        t_sep, _ = timeit(sep_pair, xr, xd)
        t_grp, _ = timeit(grouped_pair, xg)
        t_33, _ = timeit(sep_3x3, xr, xd)
        gf_pair = 2 * B * H * W * (3 * C * C * 2 + 3 * C * C * 2) / 1e9
        print(f'({H},{W},{C}) B{B}: rgb+depth NBt1D pair '
              f'{t_sep:7.2f} ms ({gf_pair / t_sep * 1000 / 1000:5.1f} '
              f'TF/s) | grouped G=2 {t_grp:7.2f} ms | '
              f'2x plain 3x3 {t_33:7.2f} ms')


if __name__ == '__main__':
    main()
