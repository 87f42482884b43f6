#!/bin/bash
# Round-4 hybrid-RoIAlign chip queue — run AFTER run_round4_tail_drives.sh.
# Measures SAD_TPU_ROI_MODE=hybrid (dense forward + windowed RMW backward;
# see ops/pallas_roi_align.py ROI_ALIGN_MODE): the round-4 stage table
# showed the in-step costs split across the two forms, so the pairing
# should beat both. Stage decomposition first (locates the saving), then
# the family matrix, then one flagship-bench remat datapoint.
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

run exact_topk_impl python tools_drives/exact_topk_impl_drive.py

export SAD_TPU_ROI_MODE=hybrid

run stage_hyb python tools_drives/rcnn_stage_drive.py "$MASK_YAML"
run faster_hyb python tools_drives/rcnn_step_drive.py "$MASK_YAML" --no-mask \
  TRAIN.IMS_PER_BATCH 2
run mask_hyb python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32
run kps_hyb python tools_drives/rcnn_step_drive.py "$KPS_YAML" \
  TRAIN.IMS_PER_BATCH 2 KRCNN.ROI_SLOTS_PER_IM 32 MRCNN.ROI_SLOTS_PER_IM 32

unset SAD_TPU_ROI_MODE
run bench_remat_on python bench.py REMAT_BACKBONE True

# bs8 remat matrix re-runs: the original cont-queue attempts both died on
# the RoIAlign meta SMEM lane-padding bug (fixed: cols-major meta); the
# remat question at bs8 geometry (VERDICT r3 item 3) needs these two.
run remat_bs8_off2 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE False
run remat_bs8_on2 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE True

echo "=== hybrid queue done fail=$fail"
exit $fail
