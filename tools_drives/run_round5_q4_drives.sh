#!/bin/bash
# Round-5 chip queue #4 — R-CNN SERVING path:
#   1) stage decomposition of the inference pipeline (where do 17 ms/im go)
#      + the TEST.NMS_CAND_TOPK=4096 decode variant timed in the same run
#   2) fidelity of the candidate cut on a trained model (AP + det diff)
#   3) if the cut wins: re-measure the headline serving rows with it
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

run rcnn_infer_stages 3600 python tools_drives/rcnn_infer_stage_drive.py
run nms_cand_parity 5400 python tools_drives/nms_cand_parity_drive.py
export RESULT_SUFFIX=_cand4k
run rcnn_infer_cand4k 3600 \
  python tools_drives/rcnn_infer_drive.py TEST.NMS_CAND_TOPK 4096
unset RESULT_SUFFIX

echo "=== round5 queue #4 done fail=$fail"
exit $fail
