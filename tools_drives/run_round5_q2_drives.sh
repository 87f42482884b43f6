#!/bin/bash
# Round-5 chip queue #2 — run after run_round5_chip_drives.sh:
#   1. affine_fold  — the FOLD_AFFINE lever measurement (VERDICT r4 item 4:
#                     one measured win or recorded negative).
#   2. long_soak    — >=20k-iter flagship distillation soak with the orbax
#                     backend, mid-run SIGKILL + AUTO_RESUME, retention,
#                     dashboard, eval-from-orbax (VERDICT r4 item 6).
# Every drive writes tools_drives/results/*.json via driveutil.
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

run affine_fold 3600 python tools_drives/affine_fold_drive.py
run long_soak 10800 python tools_drives/long_soak_drive.py

echo "=== round5 queue #2 done fail=$fail"
exit $fail
