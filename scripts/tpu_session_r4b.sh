#!/bin/bash
# Round-4 follow-up TPU session — STRICTLY SEQUENTIAL (one process at a
# time; the axon claim wedges on concurrent attach). Run ONLY after
# tpu_session_r4.sh has fully exited.
#
# Contents: the three round-4 experiments that need a chip —
#   1. MSDA fused-prep ablation (the 91 ms/layer encoder finding)
#   2. RAFT fused corr-pyramid kernel vs XLA path (VERDICT #3b)
#   3. DETR backbone per-stage MFU attribution (VERDICT weak #6)
# Decision steps (default flips + re-bench) happen manually from the
# results.
set -u
LOGD=/tmp/tpu_r4b
mkdir -p "$LOGD"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> "$LOGD/summary.log"
  timeout "$to" "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc end $(date +%T)" >> "$LOGD/summary.log"
  tail -8 "$LOGD/$name.log" >> "$LOGD/summary.log"
  return $rc
}

run probe 240 python -c "import jax; print(jax.devices())" || {
  echo "CLAIM DOWN" >> "$LOGD/summary.log"; exit 1; }

# fused_prep + corr_pallas steps RAN 2026-08-18 and their code was deleted
# on the results (DEVELOPMENT.md round-4: fused prep lost e2e 678 vs
# 583 ms; pallas corr lost to XLA 2.85 vs 2.07 ms and could not tile
# 46x62). Remaining:
run backbone_mfu 2700 python scripts/exp_backbone_mfu.py
run backbone_mfu_nos2d 1800 python scripts/exp_backbone_mfu.py --no-s2d

echo "SESSION R4B DONE $(date +%T)" >> "$LOGD/summary.log"
