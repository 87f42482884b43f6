#!/bin/bash
# Round-4 tail chip queue — run AFTER run_round4_chip_drives_cont.sh.
# One drive: the rpn_topk parity drive in --train-both mode (trains a
# second Faster R-CNN with RPN.EXACT_TOPK=False so the approx candidate
# selection feeds NMS + fg/bg sampling DURING training — the half of the
# knob the round-3 drive left unmeasured; advisor r3 item 2).
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
  return 1
}

ping_chip || exit 1
timeout 5400 python tools_drives/rpn_topk_parity_drive.py --train-both \
  > tools_drives/logs/rpn_train_both.log 2>&1 &
echo $! > /tmp/chip_drive_rpn_train_both.pid
wait $!
rc=$?
echo "--- rpn_train_both rc=$rc; tail:"
tail -6 tools_drives/logs/rpn_train_both.log
exit $rc
