#!/bin/bash
# Round-4 RetinaNet model-zoo matrix — plain train step at true 1x geometry
# vs the three upstream MODEL_ZOO step-time rows (R-50 / R-101 /
# X-101-64x4d, the last exercising grouped convs at production scale).
# bs8 (4 groups x 2) for throughput; X-101 also at bs4 in case bs8
# pressures HBM at the 832-canvas.
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
CFGS=/root/reference/detectron/configs/12_2017_baselines

run zoo_r50 python tools_drives/retinanet_zoo_drive.py \
  "$CFGS/retinanet_R-50-FPN_1x.yaml" --groups 4
run zoo_r101 python tools_drives/retinanet_zoo_drive.py \
  "$CFGS/retinanet_R-101-FPN_1x.yaml" --groups 4
run zoo_x101_bs4 python tools_drives/retinanet_zoo_drive.py \
  "$CFGS/retinanet_X-101-64x4d-FPN_1x.yaml" --groups 2
run zoo_x101_bs8 python tools_drives/retinanet_zoo_drive.py \
  "$CFGS/retinanet_X-101-64x4d-FPN_1x.yaml" --groups 4

echo "=== zoo queue done fail=$fail"
exit $fail
