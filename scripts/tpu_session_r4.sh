#!/bin/bash
# Round-4 TPU measurement session — STRICTLY SEQUENTIAL.
#
# The axon claim hard-wedges when two processes attach concurrently
# (DEVELOPMENT.md round-3 "TPU claim status"); every step is
# timeout-bounded and the next starts only after the previous exits.
# Logs land in /tmp/tpu_r4/, one file per step + a rolling summary.
#
# Round-4 ordering (vs r3): parity gates first as always, then the
# deformable PROFILE and the full BENCH immediately — bank a non-null
# record early in case the claim wedges again — then the kernel
# ablations and the two recorded training demos.
set -u
LOGD=/tmp/tpu_r4
mkdir -p "$LOGD"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> "$LOGD/summary.log"
  timeout "$to" "$@" > "$LOGD/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc end $(date +%T)" >> "$LOGD/summary.log"
  tail -6 "$LOGD/$name.log" >> "$LOGD/summary.log"
  return $rc
}

run probe 240 python -c "import jax; print(jax.devices())" || {
  echo "CLAIM STILL DOWN" >> "$LOGD/summary.log"; exit 1; }

# parity gates: a wrong-but-fast kernel must never produce numbers
run parity_msda 1800 python scripts/tpu_parity_msda.py || {
  echo "PARITY GATE FAILED (msda)" >> "$LOGD/summary.log"; exit 2; }
run parity_models 3600 python scripts/tpu_parity_models.py || {
  echo "PARITY GATE FAILED (models)" >> "$LOGD/summary.log"; exit 2; }

# VERDICT r3 #2: where do the non-kernel ~600ms of the deformable batch go
run prof_deform 2700 python scripts/profile_deformable.py

# bank the full parity-gated bench record EARLY
run bench 6000 python bench.py

# round-3 kernel ablation: heads-in-lanes vs shipped layout, op + encoder
run msda5_b16 2400 python scripts/exp_msda5.py --b 16
run msda5_t128 1200 python scripts/exp_msda5.py --b 16 --tile-q 128 --variants phl,phlb,pbh

# dedicated backward kernel: parity + timing vs block autodiff (VERDICT #3a)
run bwd_dec 1800 python scripts/exp_bwd_kernel.py
run bwd_enc 1800 python scripts/exp_bwd_kernel.py --encoder

# VERDICT #4: reference multi-scale geometry training, recorded
run geometry 6000 python scripts/train_geometry_tpu.py --batches 40

# VERDICT #5: RAFT OneCycleLR overfit demo (EPE curve)
run raft_overfit 6000 python scripts/overfit_raft_tpu.py --steps 600 --eval-every 50

echo "SESSION DONE $(date +%T)" >> "$LOGD/summary.log"
