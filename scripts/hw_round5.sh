#!/bin/bash
# Round-5 hardware pass: confirm the round-4 state and close the two
# open measurement questions (see PERF.md):
# 1. serve sanity (expect ~645 f/s EMSANet, ~183 f/s EMSAFormer
#    whole-sub-block attention incl. C=1024 -- tenancy noise up to 3x,
#    repeat any sample that moves >10%)
# 2. eval B256 re-sweep AFTER the flatten-free metric paths (the r4
#    422.4 row is B128; B256 was 397.5 BEFORE that change and has not
#    been re-measured since)
# 3. EMSAFormer train with the block kernel serving default untouched
#    (training path still routes the custom-VJP q/k/v kernel -- confirm
#    no regression at B64 --remat, expect ~50 f/s)
# 4. per-op eval profile only if a number moved outside noise
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_round5.log}
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

note "hw_round5 start"

run_step serve_sanity 1800 python bench.py
run_step serve_emsaformer 1800 python bench.py --model emsaformer_dve_v2

run_step eval_b128 2400 python bench.py --eval --batch-size 128
run_step eval_b256 2400 python bench.py --eval --batch-size 256

run_step train_emsaformer_b64_remat 2400 \
    python bench.py --model emsaformer_dve_v2 --train \
    --batch-size 64 --remat

note "hw_round5 done; results in $LOG"
grep -E '^\{|rc=' "$LOG" | tail -20
