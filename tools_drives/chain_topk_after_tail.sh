#!/bin/bash
# Wait for the tail chain (pid $1) to exit, then run the topk flip drives.
set -u
PREV_PID="${1:?usage: chain_topk_after_tail.sh <prev-pid>}"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_topk_flip_drives.sh \
  > /root/repo/tools_drives/logs/round4_topk_flip.log 2>&1
