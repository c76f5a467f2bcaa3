"""Exactness check: fused finisher kernel vs XLA twin on real TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nicr_mtsa_tpu.ops.pallas.semantic_finisher import (
    upsample2x_argmax_score, upsample2x_argmax_score_reference)

dtype = jnp.float32 if len(sys.argv) < 2 else getattr(jnp, sys.argv[1])
B, H, W, C = 128, 240, 320, 40
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 3,
                dtype)
kernel = jnp.asarray(rng.standard_normal((3, 3, 1, C)).astype(np.float32)
                     * 0.3)
bias = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)

idx_p, score_p = upsample2x_argmax_score(x, kernel, bias)
idx_r, score_r = upsample2x_argmax_score_reference(x, kernel, bias)
idx_p, score_p, idx_r, score_r = map(
    np.asarray, (idx_p, score_p, idx_r, score_r))

mism = int((idx_p != idx_r).sum())
total = idx_p.size
sd = np.abs(score_p - score_r).max()
print(f"dtype={dtype.__name__} idx mismatches: {mism}/{total} "
      f"({100.0*mism/total:.4f}%)  score maxdiff: {sd:.3e}", flush=True)
if mism:
    ys, xs = np.nonzero((idx_p != idx_r).any(axis=0))
    print("first mismatch coords (y,x):",
          list(zip(ys[:10].tolist(), xs[:10].tolist())))
    bs = np.nonzero((idx_p != idx_r).any(axis=(1, 2)))[0]
    print("batches with mismatches:", bs[:20].tolist(), "...",
          len(bs), "total")
sys.exit(1 if mism else 0)
