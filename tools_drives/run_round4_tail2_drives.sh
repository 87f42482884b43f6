#!/bin/bash
# Round-4 tail-2 chip queue — runs AFTER the zoo queue. Re-runs that never
# landed earlier in the round, now against the NEW defaults (hybrid
# RoIAlign auto mode + PartialReduce exact top-k):
#   1. remat bs8 off/on (VERDICT r3 item 3 — the bs8 HBM-pressure case the
#      SMEM meta fix re-enabled; bs2 measured remat LOSES 5%).
#   2. bench.py REMAT_BACKBONE True (flagship-bench remat datapoint; the
#      hybrid-queue attempt died with the runner).
#   3. bench.py at the new defaults (confirm the flagship headline).
#   4. rpn_topk parity --train-both (advisor r3 item 2; previously crashed
#      on the c=64 Mosaic reshape — now degrades to the dense RoI path via
#      the lane-alignment guard).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export PYTHONFAULTHANDLER=1
mkdir -p tools_drives/logs

ping_chip() {
  for i in 1 2 3 4 5 6 7 8; do
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
jax.block_until_ready(x @ x)" >/dev/null 2>&1 && return 0
    echo "--- chip ping $i failed; waiting 150s for lease reap"
    sleep 150
  done
  echo "--- chip unreachable after 8 pings"
  return 1
}

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name: $*"
  ping_chip || { fail=1; return; }
  timeout "$tmo" "$@" > "tools_drives/logs/$name.log" 2>&1 &
  echo $! > "/tmp/chip_drive_$name.pid"
  wait $!
  rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -4 "tools_drives/logs/$name.log"
  fail=$(( fail || rc ))
}
fail=0
MASK_YAML=/root/reference/detectron/configs/12_2017_baselines/e2e_mask_rcnn_R-50-FPN_1x.yaml

run remat_bs8_off 3600 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE False
run remat_bs8_on 3600 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE True
run bench_remat_on 2400 python bench.py REMAT_BACKBONE True
run bench_r4b 2400 python bench.py
run rpn_train_both 5400 python tools_drives/rpn_topk_parity_drive.py --train-both

echo "=== tail-2 queue done fail=$fail"
exit $fail
