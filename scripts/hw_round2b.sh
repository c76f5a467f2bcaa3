#!/bin/bash
# Hardware follow-up after the bilinear finisher + split fuse conv:
# batch re-sweeps now that peak HBM dropped (4x finisher removed the
# fullres logits; split conv removed the MLP concat), plus the eval
# profile that picks the next eval-throughput target.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_round2b.log}
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

note "hw_round2b start"

# 1. EMSANet serving: does a larger batch now beat 256? (the 4x
#    finisher killed the 6.3 GB fullres logits; B384 fit even before)
run_step serve_b384 1800 python bench.py --batch-size 384
run_step serve_b512 1800 python bench.py --batch-size 512

# 2. fused eval: next doubling after the B128 default
run_step eval_b256 2400 python bench.py --eval --batch-size 256

# 3. per-op profile of the eval program (next-target discovery)
run_step profile_eval 2400 python scripts/profile_eval.py --batch-size 128

note "hw_round2b done; results in $LOG"
grep -E '^\{|rc=' "$LOG" | tail -20
