#!/bin/bash
# Round-3 TPU measurement session — STRICTLY SEQUENTIAL.
#
# The axon claim hard-wedges when two processes attach concurrently
# (DEVELOPMENT.md "TPU claim status"); every step below is timeout-bounded
# and the next starts only after the previous exits. Logs land in
# /tmp/tpu_r3/, one file per step + a rolling summary.
#
# Order: parity gates first (a wrong-but-fast kernel must not produce
# numbers), then the round-3 kernel ablation (heads-in-lanes layout), the
# component profile, the two recorded training demos (reference geometry +
# RAFT), and finally the parity-gated bench.
set -u
LOGD=/tmp/tpu_r3
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

run parity_msda 1200 python scripts/tpu_parity_msda.py || {
  echo "PARITY GATE FAILED (msda)" >> "$LOGD/summary.log"; exit 2; }
run parity_models 2700 python scripts/tpu_parity_models.py || {
  echo "PARITY GATE FAILED (models)" >> "$LOGD/summary.log"; exit 2; }

# round-3 kernel ablation: heads-in-lanes vs shipped layout, op + encoder
run msda5_b16 2400 python scripts/exp_msda5.py --b 16
run msda5_b8 1800 python scripts/exp_msda5.py --b 8
run msda5_dec 1200 python scripts/exp_msda5.py --b 16 --decoder
# hl at a bigger query tile (fewer grid steps; VMEM now level-scoped)
run msda5_t128 1200 python scripts/exp_msda5.py --b 16 --tile-q 128 --variants phl,phlb,pbh

# dedicated backward kernel: parity + timing vs block autodiff (VERDICT #6)
run bwd_dec 1800 python scripts/exp_bwd_kernel.py
run bwd_enc 1800 python scripts/exp_bwd_kernel.py --encoder

# where the deformable batch goes now (bs16 640 bf16)
run prof_deform 2700 python scripts/profile_deformable.py

# VERDICT ask 4: reference multi-scale geometry training, recorded
run geometry 6000 python scripts/train_geometry_tpu.py --batches 40

# VERDICT ask 7: RAFT OneCycleLR overfit demo (EPE curve)
run raft_overfit 6000 python scripts/overfit_raft_tpu.py --steps 600 --eval-every 50

# the full parity-gated bench record
run bench 6000 python bench.py

echo "SESSION DONE $(date +%T)" >> "$LOGD/summary.log"
