#!/bin/bash
# Round-4 queue: X-101 teacher inference (pseudo-label rate, exact+approx)
# and the grouped-conv end-to-end learning proof on the chip.
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

run x101_infer 3600 python tools_drives/x101_infer_drive.py
run gconv_learn 3600 python tools_drives/gconv_learning_drive.py

echo "=== xinfer queue done fail=$fail"
exit $fail
