#!/bin/bash
# Round-4 chip queue CONTINUATION — roi_kernel_r4 already completed
# (tools_drives/logs/roi_kernel_r4.log, DRIVE OK); the original queue was
# killed at a session boundary mid-faster_r4, which wedged the
# single-tenant chip lease: a client killed mid-compile leaves the server
# side holding its session, and any client launched before the server
# reaps it hangs forever on its first compile RPC (observed 22:20-23:14;
# a trivial matmul ping recovered ~2.5 min after ALL local clients died).
# Hence: ping-until-healthy before every drive, PYTHONFAULTHANDLER for
# stacks, one retry per timed-out drive. Run detached (setsid); stop with
# /tmp/chip_drive_<name>.pid, never pkill.
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
jax.block_until_ready(x @ x)
print('chip ping ok')" >/dev/null 2>&1 && return 0
    echo "--- chip ping $i failed; waiting 150s for lease reap"
    sleep 150
  done
  echo "--- chip unreachable after 8 pings"
  return 1
}

run_once() {
  name="$1"; shift
  timeout 2400 "$@" > "tools_drives/logs/$name.log" 2>&1 &
  echo $! > "/tmp/chip_drive_$name.pid"
  wait $!
  return $?
}

run() {
  name="$1"; shift
  echo "=== $name: $*"
  ping_chip || { fail=1; return; }
  run_once "$name" "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "--- $name rc=$rc; retrying once after ping"
    ping_chip || { fail=1; return; }
    run_once "$name" "$@"
    rc=$?
  fi
  echo "--- $name rc=$rc; tail:"
  tail -4 "tools_drives/logs/$name.log"
  fail=$(( fail || rc ))
}
fail=0
MASK_YAML=/root/reference/detectron/configs/12_2017_baselines/e2e_mask_rcnn_R-50-FPN_1x.yaml
KPS_YAML=/root/reference/detectron/configs/12_2017_baselines/e2e_keypoint_rcnn_R-50-FPN_1x.yaml

run faster_r4 python tools_drives/rcnn_step_drive.py "$MASK_YAML" --no-mask \
  TRAIN.IMS_PER_BATCH 2
run mask_r4 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32
run kps_r4 python tools_drives/rcnn_step_drive.py "$KPS_YAML" \
  TRAIN.IMS_PER_BATCH 2 KRCNN.ROI_SLOTS_PER_IM 32 MRCNN.ROI_SLOTS_PER_IM 32

run stage_r4 python tools_drives/rcnn_stage_drive.py "$MASK_YAML"

run remat_bs2_off python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE False
run remat_bs2_on python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE True
run remat_bs8_off python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE False
run remat_bs8_on python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE True

run fast_profile python tools_drives/fast_profile_drive.py
run frcnn_fast python tools_drives/rcnn_step_drive.py "$MASK_YAML" --no-mask \
  TRAIN.IMS_PER_BATCH 2 RPN.EXACT_TOPK False

run bench_r4 python bench.py

echo "=== round-4 continuation queue done (fail=$fail)"
exit $fail
