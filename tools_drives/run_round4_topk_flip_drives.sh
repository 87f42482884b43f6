#!/bin/bash
# Round-4 exact-top-k implementation flip — run AFTER the tail queue.
# exact_topk_impl_drive proved ApproxTopK(recall_target=1.0) returns the
# exact multiset and is 1.53x the sort at decode geometry; this measures
# the END-TO-END effect before ops/topk.py's default flips to auto:
#   1. headline exact inference, sort vs partial_reduce
#   2. Faster R-CNN step (RPN exact top-k in-graph), sort vs partial_reduce
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
  name="$1"; shift
  echo "=== $name: $*"
  ping_chip || { fail=1; return; }
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

export SAD_TPU_EXACT_TOPK_IMPL=sort
run inf_topk_sort python tools_drives/fast_profile_drive.py
run frcnn_topk_sort python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  --no-mask TRAIN.IMS_PER_BATCH 2

export SAD_TPU_EXACT_TOPK_IMPL=partial_reduce
run inf_topk_pr python tools_drives/fast_profile_drive.py
run frcnn_topk_pr python tools_drives/rcnn_step_drive.py "$MASK_YAML" \
  --no-mask TRAIN.IMS_PER_BATCH 2

echo "=== topk flip queue done fail=$fail"
exit $fail
