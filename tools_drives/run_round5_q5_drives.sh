#!/bin/bash
# Round-5 chip queue #5 — serving-path levers isolated by the q4 stage
# decomposition (results/rcnn_infer_stages.json: RoIAlign+box head 89.5 ms
# of the 137 ms Faster step; candidate top-k 13.6 ms; final NMS 4 ms):
#   A) windowed Pallas RoIAlign FORWARD on the eval path (no backward at
#      inference, so the train-side "dense fwd overlaps better" finding
#      does not bind; each roi reads only its one level's window)
#   B) the full serving profile: windowed + approx RPN top-k (measured
#      AP-neutral, rpn_topk_parity) + NMS_CAND_TOPK 4096
#   C) approx RPN top-k alone (attribution for B)
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

export SAD_TPU_ROI_MODE=windowed
export RESULT_SUFFIX=_roiwin
run rcnn_infer_roiwin 3600 python tools_drives/rcnn_infer_drive.py

export RESULT_SUFFIX=_serving_profile
run rcnn_infer_serving_profile 3600 python tools_drives/rcnn_infer_drive.py \
  RPN.EXACT_TOPK False TEST.NMS_CAND_TOPK 4096
unset SAD_TPU_ROI_MODE

export RESULT_SUFFIX=_rpnapprox
run rcnn_infer_rpnapprox 3600 python tools_drives/rcnn_infer_drive.py \
  RPN.EXACT_TOPK False
unset RESULT_SUFFIX

echo "=== round5 queue #5 done fail=$fail"
exit $fail
