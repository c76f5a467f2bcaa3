#!/bin/bash
# Hardware follow-up for round 4 (or a fresh chip window): validate
# round-3 state, chase the environment-sensitive EMSAFormer numbers,
# and sweep the new resize_reduce kernel's block sizes.
#
# Round-3 context (PERF.md):
# - fused eval: 397.9 f/s B128 (bucketed slots + resize_reduce kernel);
#   B256 now compiles (397.5).
# - EMSAFormer serve regressed ~20% ENVIRONMENTALLY between the r2 and
#   r3 chip sessions (r2 tree re-measured 152.8 vs its recorded 191.9
#   at B64) -- re-measure first; if the old numbers return, re-sweep.
# - top EMSAFormer item: q/k/v relayout copies around the attention
#   custom-calls (~80-116 ms at B128; PERF.md roofline section).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_round3.log}
: > "$LOG"

note() { echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG"; }

probe() {
    for i in 1 2 3 4 5; do
        if timeout 180 python -c \
            "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" \
            >> "$LOG" 2>&1; then
            return 0
        fi
        echo "probe $i failed; waiting 60s" | tee -a "$LOG"
        sleep 60
    done
    return 1
}

run_step() {
    local name=$1 tmo=$2; shift 2
    note "step: $name"
    if ! probe; then
        note "$name SKIPPED (chip unreachable)"
        return 1
    fi
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    note "$name rc=$rc"
    return $rc
}

note "hw_round3 start"

# 1. serving sanity (expect ~645)
run_step serve_defer4x 1800 python bench.py

# 2. fused eval re-measure (r3: 397.9 B128 / 397.5 B256) + B384
run_step eval_b128 2400 python bench.py --eval --batch-size 128
run_step eval_b256 2400 python bench.py --eval --batch-size 256
run_step eval_b384 2400 python bench.py --eval --batch-size 384

# 3. EMSAFormer environment check (r2 session: 191.9 B64 / 192.6 B128;
#    r3 session: 153.1 / 171.5 -- which environment is this?)
run_step emsaformer_b128 2400 \
    python bench.py --model emsaformer_dve_v2 --batch-size 128
run_step emsaformer_b64 2400 \
    python bench.py --model emsaformer_dve_v2 --batch-size 64

# 4. EMSAFormer train remat ceiling (r3: 49.7 at B64+remat); B96 next
run_step emsaformer_train_b96 3000 \
    python bench.py --model emsaformer_dve_v2 --train --batch-size 96 \
    --remat --iters 10

# 5. per-op eval re-profile with the r3 kernels in place
run_step profile_eval 2400 python scripts/profile_eval.py --batch-size 128 --top 15

# 6. spatial-infer latency row (PERF.md weakness: B1 latency is
#    tunnel-bound; the sharded single-image path has no hardware row)
run_step latency 1800 python bench.py --latency

note "hw_round3 done; results in $LOG"
grep -E '^\{|rc=' "$LOG" | tail -24
