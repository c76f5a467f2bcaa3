#!/bin/bash
# Round-4 hardware pass: validate round-3 state, land the new
# measured rows the r3 verdict asks for, and collect the eval-forward
# profile that drives this round's optimization work.
#
# Steps (each independent; rc logged):
# 1. serve sanity (expect ~645 f/s)
# 2. chunked resize_reduce exactness (new B%8 path) -- MUST pass
#    before any eval rows below are trusted
# 3. fused eval rows: B128 (r3: 397.9), B192 (NEW -- used to OOM via
#    the XLA fallback), B64 (now takes the kernel path too)
# 4. EMSANet train: B48 sanity (107.5), then the NEW CNN remat path:
#    B48/B96/B128 --remat (B96 used to OOM by 4.8G)
# 5. per-op eval profile at B128 (the forward attack list)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_round4.log}
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

note "hw_round4 start"

run_step serve_sanity 1800 python bench.py

run_step resize_reduce_exact 1800 \
    python scripts/resize_reduce_exact_hw.py --big

run_step eval_b128 2400 python bench.py --eval --batch-size 128
run_step eval_b192 2400 python bench.py --eval --batch-size 192
run_step eval_b64 2400 python bench.py --eval --batch-size 64

run_step train_b48 2400 python bench.py --train --batch-size 48
run_step train_b48_remat 2400 \
    python bench.py --train --batch-size 48 --remat
run_step train_b96_remat 3000 \
    python bench.py --train --batch-size 96 --remat --iters 10
run_step train_b128_remat 3000 \
    python bench.py --train --batch-size 128 --remat --iters 10

run_step profile_eval 2400 \
    python scripts/profile_eval.py --batch-size 128 --top 30

note "hw_round4 done; results in $LOG"
grep -E '^\{|rc=' "$LOG" | tail -30
