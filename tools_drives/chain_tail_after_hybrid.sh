#!/bin/bash
# Wait for the hybrid queue (pid $1) to exit, then run the rpn train-both tail drive.
set -u
HYB_PID="${1:?usage: chain_tail_after_hybrid.sh <hybrid-pid>}"
while kill -0 "$HYB_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_tail_drives.sh \
  > /root/repo/tools_drives/logs/round4_tail.log 2>&1
