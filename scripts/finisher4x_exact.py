"""Exactness check: fused 4x finisher kernel vs XLA twin on real TPU.

Same protocol as scripts/finisher_exact.py (which see for the
precision rationale): the two-conv XLA twin runs under
jax.default_matmul_precision('highest'), residual argmax flips are
adjudicated by an f64 numpy oracle of the two-stage phase conv with
the intermediate rounded to the compute dtype exactly as both device
paths round it.

Usage: python scripts/finisher4x_exact.py [bfloat16]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nicr_mtsa_tpu.ops.pallas.semantic_finisher4x import (
    upsample4x_argmax_score, upsample4x_argmax_score_reference)
from nicr_mtsa_tpu.models.upsampling import fused_zeropad_2x_kernel

dtype = jnp.float32 if len(sys.argv) < 2 else getattr(jnp, sys.argv[1])
B, H, W, C = 128, 120, 160, 40          # the serving quarter-res shape
TIE_TOL = 1e-4
rng = np.random.default_rng(0)
t0 = time.perf_counter()
x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
     * 3).astype(dtype)
k1 = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32) * 0.3)
b1 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
k2 = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32) * 0.3)
b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
jax.block_until_ready(x)
print(f"[{time.perf_counter() - t0:.1f}s] inputs on device", flush=True)

idx_p, score_p = upsample4x_argmax_score(x, k1, b1, k2, b2)
idx_p, score_p = np.asarray(idx_p), np.asarray(score_p)
print(f"[{time.perf_counter() - t0:.1f}s] pallas kernel done", flush=True)

ref_fn = jax.jit(upsample4x_argmax_score_reference)
with jax.default_matmul_precision('highest'):
    chunks = [tuple(map(np.asarray, ref_fn(x[i:i + 16], k1, b1, k2, b2)))
              for i in range(0, B, 16)]
idx_r = np.concatenate([c[0] for c in chunks])
score_r = np.concatenate([c[1] for c in chunks])
print(f"[{time.perf_counter() - t0:.1f}s] XLA twin done", flush=True)

mism = idx_p != idx_r
n_mism = int(mism.sum())
total = idx_p.size
sd = np.abs(score_p - score_r).max()
print(f"dtype={dtype.__name__} idx mismatches vs HIGHEST-precision twin: "
      f"{n_mism}/{total} ({100.0 * n_mism / total:.4f}%)  "
      f"score maxdiff: {sd:.3e}", flush=True)

n_real = 0
if n_mism:
    np_dt = np.float32 if dtype == jnp.float32 else jnp.bfloat16
    k1t = np.asarray(fused_zeropad_2x_kernel(k1), np.float64)
    k2t = np.asarray(fused_zeropad_2x_kernel(k2), np.float64)
    b1_64 = np.asarray(b1, np.float64)
    b2_64 = np.asarray(b2, np.float64)
    # the one place the operand crosses the tunnel; intermediate
    # computed at f64 but rounded to the compute dtype like both
    # device paths
    xh = np.asarray(x, np.float64)
    print(f"[{time.perf_counter() - t0:.1f}s] host operand fetched",
          flush=True)
    xpad = np.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)))
    inter = np.zeros((B, 2 * H, 2 * W, C))
    for py in (0, 1):
        for px in (0, 1):
            acc = np.zeros((B, H, W, C))
            for a in (0, 1):
                for bb in (0, 1):
                    w = k1t[2 * a + py, 2 * bb + px, 0]
                    acc += w * xpad[:, a + py:a + py + H,
                                    bb + px:bb + px + W]
            inter[:, py::2, px::2] = acc
    inter = np.asarray(inter.astype(np_dt), np.float64) + b1_64
    inter = np.asarray(inter.astype(np_dt), np.float64)
    ipad = np.pad(inter, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for b in np.nonzero(mism.any(axis=(1, 2)))[0]:
        ys, xs = np.nonzero(mism[b])
        i, qy = ys // 2, ys % 2
        j, qx = xs // 2, xs % 2
        logit = np.zeros((len(ys), C))
        for c in (0, 1):
            for d in (0, 1):
                w = k2t[2 * c + qy, 2 * d + qx, 0]
                logit += w * ipad[b, i + c + qy, j + d + qx]
        logit += b2_64
        lp = logit[np.arange(len(ys)), idx_p[b, ys, xs]]
        lr = logit[np.arange(len(ys)), idx_r[b, ys, xs]]
        n_real += int((np.abs(lp - lr) > TIE_TOL).sum())
    print(f"real mismatches (f64 logit gap > {TIE_TOL:g}): "
          f"{n_real}/{n_mism}", flush=True)

ok = n_real == 0 and sd < (5e-4 if dtype == jnp.float32 else 5e-2)
print("PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
