#!/bin/bash
# Follow-up hardware session after hw_validate_resume: the swin-train
# re-run (bf16 VJP fix), candidate-default measurements (eval B128,
# serving --defer4x), and the profiling/tuning passes that pick the
# next optimization targets.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_followup.log}
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

note "hw_round2_followup start"

# 1. swin-train sanity with the bf16 VJP dtype fix
run_step train_swin 2400 python bench.py --train \
    --model emsaformer_dve_v2 --batch-size 8 --iters 5

# 2. eval B128 (B64 became default; check the next doubling)
run_step eval_b128 2400 python bench.py --eval --batch-size 128

# 3. serving with the fused 4x finisher (candidate default)
run_step serve_defer4x 1800 python bench.py --defer4x

# 4. per-op profile of the serving program (next-target discovery)
run_step profile_serve 1800 python scripts/profile_bench.py --batch-size 256

# 5. window-attention tile sweep
run_step tune_attention 2400 python scripts/tune_attention.py

note "hw_round2_followup done; results in $LOG"
grep -E '^\{|rc=|frames/s|ms|PASS|FAIL' "$LOG" | tail -40
