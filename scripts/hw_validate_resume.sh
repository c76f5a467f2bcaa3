#!/bin/bash
# Resume of scripts/hw_validate.sh after a tunnel outage: the steps the
# first pass did not reach (first pass results: finisher gates timed
# out on the operand transfer -- since fixed; serve 632.7, latency
# 47.8/76.4 ms, emsaformer_v2 B64 191.9). Adds the round-2 4x-finisher
# gate and the re-run of the (now fast) 2x gates at the end.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_validate2.log}
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

note "hw_validate_resume start"

run_step serve_emsaformer_v2_b128 2400 \
    python bench.py --model emsaformer_dve_v2 --batch-size 128
run_step serve_emsaformer_v1_b64 2400 \
    python bench.py --model emsaformer_dve --batch-size 64
run_step eval_b32 2400 python bench.py --eval
run_step eval_b64 2400 python bench.py --eval --batch-size 64
run_step train 1800 python bench.py --train
run_step train_swin 2400 python bench.py --train \
    --model emsaformer_dve_v2 --batch-size 8 --iters 5

# exactness gates (fast now: operands generated on device)
run_step finisher_exact_f32 900 python scripts/finisher_exact.py
run_step finisher_exact_bf16 900 python scripts/finisher_exact.py bfloat16
run_step finisher4x_exact_f32 900 python scripts/finisher4x_exact.py
run_step finisher4x_exact_bf16 900 python scripts/finisher4x_exact.py bfloat16

note "hw_validate_resume done; results in $LOG"
grep -E '^\{|rc=|MISMATCH|frames/s|ms/step|PASS|FAIL' "$LOG" | tail -40
