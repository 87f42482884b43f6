#!/bin/bash
# Round-4 chip queue — run AFTER the dress rehearsal completes (VERDICT r3
# items 2, 3, 6). Default env (ONE real TPU via the axon plugin); only
# prepend the repo to PYTHONPATH. Logs under tools_drives/logs/; stop a
# drive with its PID file, never pkill by pattern.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p tools_drives/logs

run() {
  name="$1"; shift
  echo "=== $name: $*"
  timeout 2400 "$@" > "tools_drives/logs/$name.log" 2>&1 &
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

# ---- VERDICT item 2: RoIAlign kernel fwd/bwd with the new RMW backward,
# then the family numbers with the kernel default-on.
run roi_kernel_r4 python tools_drives/roi_align_kernel_drive.py

run faster_r4 python tools_drives/rcnn_step_drive.py "$MASK_YAML" --no-mask \
  TRAIN.IMS_PER_BATCH 2
run mask_r4 python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32
run kps_r4 python tools_drives/rcnn_step_drive.py "$KPS_YAML" \
  TRAIN.IMS_PER_BATCH 2 KRCNN.ROI_SLOTS_PER_IM 32 MRCNN.ROI_SLOTS_PER_IM 32

# Updated box-path stage table (Sgrad row isolates the RoIAlign backward)
run stage_r4 python tools_drives/rcnn_stage_drive.py "$MASK_YAML"

# ---- VERDICT item 3: REMAT_BACKBONE matrix at mask-1x geometry,
# bs2/bs8 x remat on/off (per-image-cost growth with batch = HBM pressure)
run remat_bs2_off python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE False
run remat_bs2_on python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 2 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE True
run remat_bs8_off python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE False
run remat_bs8_on python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  TRAIN.IMS_PER_BATCH 8 MRCNN.ROI_SLOTS_PER_IM 32 REMAT_BACKBONE True

# ---- VERDICT item 6: the fast profile (both approx knobs measured)
run fast_profile python tools_drives/fast_profile_drive.py
run frcnn_fast python tools_drives/rcnn_step_drive.py "$MASK_YAML" --no-mask \
  TRAIN.IMS_PER_BATCH 2 RPN.EXACT_TOPK False

# ---- bench sanity (the driver reruns this at round end)
run bench_r4 python bench.py

echo "=== round-4 chip queue done (fail=$fail); logs in tools_drives/logs/"
exit $fail
