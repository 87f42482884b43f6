#!/bin/bash
# Wait until the zoo queue runner exits, then run the tail-2 queue.
set -u
PREV_PID="${1:?usage: chain_tail2_after_zoo.sh <prev-pid>}"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_tail2_drives.sh \
  > /root/repo/tools_drives/logs/round4_tail2.log 2>&1
