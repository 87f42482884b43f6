#!/bin/bash
# Turnkey runner for the chip work queued while the axon tunnel was wedged
# (round-2 tail). Run from any shell with the default env (ONE real TPU via
# the axon plugin — do NOT set JAX_PLATFORMS/PYTHONPATH overrides beyond
# prepending the repo).
#
# Each drive writes a log under tools_drives/logs/; a wedged tunnel shows up
# as a drive producing no output for ~5 minutes — stop with the PID files,
# never pkill by pattern.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p tools_drives/logs

run() {
  name="$1"; shift
  echo "=== $name: $*"
  timeout 1800 "$@" > "tools_drives/logs/$name.log" 2>&1 &
  echo $! > "/tmp/chip_drive_$name.pid"
  wait $!
  rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -5 "tools_drives/logs/$name.log"
  fail=$(( fail || rc ))
}
fail=0

# 1. Keypoint R-CNN train-step throughput at the reference keypoint geometry
#    (the drive that was in flight when the tunnel wedged). Baseline:
#    keypoint R-50-FPN 1x trains at 16 imgs / 0.832 s = 2.40 imgs/s/GPU.
run kps_step python tools_drives/rcnn_step_drive.py \
  /root/reference/detectron/configs/12_2017_baselines/e2e_keypoint_rcnn_R-50-FPN_1x.yaml

# 2. bf16-vs-f32 eval parity pin (AP deltas on the overfit task)
run dtype_parity python tools_drives/dtype_parity_drive.py

# 3. 1024-image pseudo-label loop + mixed-stream UNLABEL_DISTILLATION
run pseudo_scale python tools_drives/pseudo_label_scale_drive.py

# 4. bench sanity (the driver also runs this at round end)
run bench python bench.py

echo "=== all queued drives attempted; logs in tools_drives/logs/ (fail=$fail)"
exit $fail
