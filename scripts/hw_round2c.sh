#!/bin/bash
# Hardware follow-up after the blocked 2-tap device resize
# (models/upsampling.py): the B128 eval profile blamed the old
# jax.image.resize dense-dot lowering for ~70 ms/step and the eval
# B256 OOM (PERF.md "Fused eval"). Measure the win, retry the next
# batch doublings, and re-profile to pick the next eval target.
# Serving also routes fullres outputs through the same resize when
# output keys request them, so re-check serving for regressions.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_round2c.log}
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

note "hw_round2c start"

# 1. fused eval with the blocked resize: B128 (old: 296.7 f/s)
run_step eval_b128 2400 python bench.py --eval --batch-size 128

# 2. next doublings (B256 OOMed on the old resize's 9.4+10 GB f32
#    temporaries; those are gone now)
run_step eval_b256 2400 python bench.py --eval --batch-size 256 \
    && run_step eval_b384 2400 python bench.py --eval --batch-size 384

# 3. per-op re-profile (next-target discovery)
run_step profile_eval 2400 python scripts/profile_eval.py --batch-size 128

# 4. serving sanity: default program re-measure (old: 644.6 --defer4x)
run_step serve_defer4x 1800 python bench.py --defer4x

# 5. train per-op profile (train has had no profile-driven pass yet;
#    107.5 f/s B48 -- find where the fwd+bwd time actually goes)
run_step profile_train 2400 python scripts/profile_train.py --batch-size 48

# 6. serving per-op profile at the current default program (the
#    "where the time goes" PERF section is stale pre-finisher B32) and
#    the EMSAFormer profile (192.6 f/s: is the Swin backbone itself
#    MXU-bound, or is there another fixable layer?)
run_step profile_serve 2400 python scripts/profile_bench.py --batch-size 256
run_step profile_emsaformer 2400 \
    python scripts/profile_bench.py --model emsaformer_dve_v2 --batch-size 128

note "hw_round2c done; results in $LOG"
grep -E '^\{|rc=' "$LOG" | tail -20
