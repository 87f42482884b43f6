#!/bin/bash
# Round-4 grouped-conv follow-up queue — AFTER the micro sweep picked
# lane packing as the auto default (BENCH_NOTES round-4 grouped-conv
# section): re-measure the X-101-64x4d zoo row at the new default.
#   1. bs4 (--groups 4, IMS_PER_BATCH=1): direct comparison to the
#      superseded fgc row (4.95 imgs/s, 807.4 ms/step).
#   2. bs8 (--groups 8): the batch the R-50/R-101 rows use — feasible
#      now if the 5.9x trunk-conv reduction holds in the full step.
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
  tail -6 "tools_drives/logs/$name.log"
  fail=$(( fail || rc ))
}
fail=0

X101=/root/reference/detectron/configs/12_2017_baselines/retinanet_X-101-64x4d-FPN_1x.yaml
run zoo_x101_lane_bs4 3000 python tools_drives/retinanet_zoo_drive.py "$X101" --groups 4
run zoo_x101_lane_bs8 3600 python tools_drives/retinanet_zoo_drive.py "$X101" --groups 8

echo "=== gconv2 queue done fail=$fail"
exit $fail
