#!/bin/bash
# EMSAFormer environmental-regression investigation (VERDICT r3 #7):
# per-op profile the CURRENT tree and the r2 tree (commit d61ccd0,
# which recorded 191.9 B64 / 192.6 B128) on the SAME chip session,
# then diff the op rollups. PERF.md already established the regression
# is environmental (the r2 tree re-measures at 152.8/171.5 today);
# this pins WHICH op families grew.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/emsaformer_diff.log}
R2_COMMIT=${R2_COMMIT:-d61ccd0}
B=${B:-128}
: > "$LOG"

echo "=== current tree profile (B$B) ===" | tee -a "$LOG"
timeout 2400 python scripts/profile_bench.py \
    --model emsaformer_dve_v2 --batch-size "$B" --top 25 \
    >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

echo "=== r2 tree ($R2_COMMIT) profile (B$B) ===" | tee -a "$LOG"
git worktree add -f /tmp/r2tree "$R2_COMMIT" >> "$LOG" 2>&1
(cd /tmp/r2tree && timeout 2400 python scripts/profile_bench.py \
    --model emsaformer_dve_v2 --batch-size "$B" --top 25) \
    >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"
git worktree remove --force /tmp/r2tree >> "$LOG" 2>&1

echo "diff written to $LOG"
