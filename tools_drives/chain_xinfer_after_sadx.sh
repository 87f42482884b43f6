#!/bin/bash
# Wait until the sadx queue runner exits, then run the xinfer queue.
set -u
PREV_PID="${1:?usage: chain_xinfer_after_sadx.sh <prev-pid>}"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_xinfer_drives.sh \
  > /root/repo/tools_drives/logs/round4_xinfer.log 2>&1
