"""Exactness check: fused finisher kernel vs XLA twin on real TPU.

The Pallas kernel accumulates in true f32 on the VPU. The XLA twin's
conv runs on the MXU, where DEFAULT precision executes f32 as a single
bf16 pass (~1e-3 relative error) — comparing against that produced
phantom "corruption" (0.31% argmax flips, 3e-2 score diffs). The twin
must therefore run under jax.default_matmul_precision('highest'), and
any residual argmax disagreements are adjudicated by an f64 numpy
oracle: a flip only counts as REAL if the f64 logit gap between the
two classes exceeds a tie tolerance (f32 vs 6-pass-bf16 accumulation
may legitimately order near-exact ties differently).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nicr_mtsa_tpu.ops.pallas.semantic_finisher import (
    upsample2x_argmax_score, upsample2x_argmax_score_reference)
from nicr_mtsa_tpu.models.upsampling import fused_zeropad_2x_kernel

dtype = jnp.float32 if len(sys.argv) < 2 else getattr(jnp, sys.argv[1])
B, H, W, C = 128, 240, 320, 40
TIE_TOL = 1e-4
rng = np.random.default_rng(0)
# generate x ON DEVICE: shipping the (128,240,320,40) f32 operand
# through the axon tunnel costs minutes; the host copy is fetched
# lazily only if the f64 tie adjudication is actually needed
t0 = time.perf_counter()
x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
     * 3).astype(dtype)
kernel = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32)
                     * 0.3)
bias = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
jax.block_until_ready(x)
print(f"[{time.perf_counter() - t0:.1f}s] inputs on device", flush=True)

idx_p, score_p = upsample2x_argmax_score(x, kernel, bias)
idx_p, score_p = np.asarray(idx_p), np.asarray(score_p)
print(f"[{time.perf_counter() - t0:.1f}s] pallas kernel done", flush=True)

# The XLA twin materializes the fullres (B, 2H, 2W, C) conv output
# (~20 GB f32 at B128) -- chunk it over the batch so the check fits
# HBM next to the Pallas outputs.
ref_fn = jax.jit(upsample2x_argmax_score_reference)
with jax.default_matmul_precision('highest'):
    chunks = [tuple(map(np.asarray, ref_fn(x[i:i + 16], kernel, bias)))
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
    # f64 oracle: fused 4x4 phase conv computed on host, only at
    # mismatching pixels (per-sample to bound memory)
    kt = np.asarray(fused_zeropad_2x_kernel(kernel), np.float64)  # (4,4,1,C)
    bias64 = np.asarray(bias, np.float64)
    # the one place the full operand crosses the tunnel
    xpad = np.pad(np.asarray(x, np.float64),
                  ((0, 0), (1, 1), (1, 1), (0, 0)))
    print(f"[{time.perf_counter() - t0:.1f}s] host operand fetched",
          flush=True)
    for b in np.nonzero(mism.any(axis=(1, 2)))[0]:
        ys, xs = np.nonzero(mism[b])
        i, py = ys // 2, ys % 2
        j, px = xs // 2, xs % 2
        logit = np.zeros((len(ys), C))
        for a in (0, 1):
            for bb in (0, 1):
                w = kt[2 * a + py, 2 * bb + px, 0]        # (n, C)
                logit += w * xpad[b, i + a + py, j + bb + px]
        logit += bias64
        lp = logit[np.arange(len(ys)), idx_p[b, ys, xs]]
        lr = logit[np.arange(len(ys)), idx_r[b, ys, xs]]
        n_real += int((np.abs(lp - lr) > TIE_TOL).sum())
    print(f"real mismatches (f64 logit gap > {TIE_TOL:g}): "
          f"{n_real}/{n_mism}", flush=True)

# the HIGHEST twin is 6-pass bf16, not bit-exact f32; accumulated
# softmax-score differences measure ~7e-5 (corruption measured 3e-2)
ok = n_real == 0 and sd < (5e-4 if dtype == jnp.float32 else 5e-2)
print("PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
