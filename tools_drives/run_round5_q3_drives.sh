#!/bin/bash
# Round-5 chip queue #3 — after the long soak frees the chip:
#   re-measure the R-CNN family matrix with the per-image-blocked dense
#   RoIAlign forward (slots_per_im), bs8 + one bs2 reference row, then
#   refresh the MFU table from the new records (CPU).
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

run mask_bs8_blk 3600 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32
run faster_bs8_blk 3600 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  --no-mask TRAIN.IMS_PER_BATCH 8
run kps_bs8_blk 3600 python tools_drives/rcnn_step_drive.py "$KPS_YAML" \
  TRAIN.IMS_PER_BATCH 8 KRCNN.ROI_SLOTS_PER_IM 32 MRCNN.ROI_SLOTS_PER_IM 32
run mask_bs2_blk 3600 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32

JAX_PLATFORMS=cpu timeout 3600 python tools_drives/mfu_report.py \
  > tools_drives/logs/mfu_r5b.log 2>&1 || fail=1
tail -3 tools_drives/logs/mfu_r5b.log

echo "=== round5 queue #3 done fail=$fail"
exit $fail
