#!/bin/bash
# Round-4 grouped-conv queue — runs AFTER the tail-2 queue (rpn_train_both).
#   1. grouped_conv_micro: phrasing sweep (fgc / group-to-batch /
#      lane-packed block-diag / dense) at the four X-101 grouped shapes,
#      infer + train modes.
#   2. If the sweep finds a winner, the zoo re-run happens in a follow-up
#      queue once the default is flipped (keep this queue pure measurement).
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

run gconv_micro 4500 python tools_drives/grouped_conv_micro_drive.py

echo "=== gconv queue done fail=$fail"
exit $fail
