#!/bin/bash
# Round-5 chip queue #1 — the VERDICT r4 "next round" measurements:
#   1. topk_guard        — PartialReduce recall-1.0 exactness pinned on chip
#                          (advisor r4; durable record).
#   2. x101_infer        — X-101 teacher inference exact+approx (Missing #2;
#                          the round-4 attempt died on the closure-captured
#                          params HTTP 413, now fixed).
#   3. x101_pseudo       — X-101 pseudo-label generation through the REAL
#                          test_net --pseudo-out CLI + exact-vs-approx
#                          fidelity diff (Missing #2 + item 5).
#   4. faster/kps bs8    — complete the bs8 family matrix (Weak #4; mask
#                          bs8 already measured 36.16 imgs/s).
#   5. roi_kernel        — re-run the RoIAlign kernel table so the round-4
#                          claim regains a durable artifact (Weak #1).
# Every drive writes tools_drives/results/*.json via driveutil.
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
KPS_YAML=/root/reference/detectron/configs/12_2017_baselines/e2e_keypoint_rcnn_R-50-FPN_1x.yaml

run topk_guard 1200 python tools_drives/topk_guard_drive.py
run x101_infer_r5 3600 python tools_drives/x101_infer_drive.py
run x101_pseudo 7200 python tools_drives/x101_pseudo_drive.py
run faster_bs8 3600 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  --no-mask TRAIN.IMS_PER_BATCH 8
run kps_bs8 3600 python tools_drives/rcnn_step_drive.py "$KPS_YAML" \
  TRAIN.IMS_PER_BATCH 8 KRCNN.ROI_SLOTS_PER_IM 32 MRCNN.ROI_SLOTS_PER_IM 32
run roi_kernel_r5 3600 python tools_drives/roi_align_kernel_drive.py

echo "=== round5 queue #1 done fail=$fail"
exit $fail
