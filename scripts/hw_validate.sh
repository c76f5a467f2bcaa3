#!/bin/bash
# Hardware validation driver: runs scripts/hw_runbook.md steps 1-8 in
# order on the real TPU, logging everything to $LOG. Each step is
# timeout-bounded and failures do not stop the sequence (exit codes are
# recorded); a crashed kernel restarts the TPU worker, so every step is
# preceded by a probe with retry. Decisions (keep/revert the
# double-buffered finisher DMA, batch-size defaults, PERF.md updates)
# stay manual -- read the log.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hw_validate.log}
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

note "hw_validate start"

# 2. finisher double-buffer DMA exactness (gate before any benching)
run_step finisher_exact_f32 900 python scripts/finisher_exact.py
FINISHER_RC=$?
run_step finisher_exact_bf16 900 python scripts/finisher_exact.py bfloat16
if [ "$FINISHER_RC" -ne 0 ]; then
    note "FINISHER MISMATCH: do NOT trust serving numbers; restore the"
    note "single-buffer DMA from 10b5d16 (see hw_runbook.md step 2)"
fi

# 3. serving flagship (default B256; expect >= 628)
run_step serve_emsanet 1800 python bench.py

# 4. latency rows
run_step latency 1800 python bench.py --latency

# 5. EMSAFormer v2 + fused window attention, then v1 comparison
run_step serve_emsaformer_v2_b64 2400 \
    python bench.py --model emsaformer_dve_v2 --batch-size 64
run_step serve_emsaformer_v2_b128 2400 \
    python bench.py --model emsaformer_dve_v2 --batch-size 128
run_step serve_emsaformer_v1_b64 2400 \
    python bench.py --model emsaformer_dve --batch-size 64

# 6. fused eval (r5 semantics: BOTH PQ pipelines; B128 default point)
run_step eval_b128 2400 python bench.py --eval --batch-size 128
run_step eval_b64 2400 python bench.py --eval --batch-size 64

# 6b. second family fused eval incl. DVE retrieval states (B16 is the
# supported point -- the 512-d dense head bounds the batch, PERF.md)
run_step eval_emsaformer_b16 2400 \
    python bench.py --eval --model emsaformer_dve_v2 --batch-size 16

# 7. train sanity (donated state + r5 best config)
run_step train 1800 python bench.py --train
run_step train_b128_remat_mu 2400 \
    python bench.py --train --batch-size 128 --remat --mu-bf16

# 8. swin-train sanity (fused attention VJP on chip)
run_step train_swin 2400 python bench.py --train \
    --model emsaformer_dve_v2 --batch-size 8 --iters 5

note "hw_validate done; results in $LOG"
grep -E '^\{|rc=|MISMATCH|frames/s|ms/step' "$LOG" | tail -40
