#!/bin/bash
# Wait for the tail queue (pid $1) to exit, then run the hybrid drives.
set -u
TAIL_PID="${1:?usage: chain_hybrid_after_tail.sh <tail-pid>}"
while kill -0 "$TAIL_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_hybrid_drives.sh \
  > /root/repo/tools_drives/logs/round4_hybrid.log 2>&1
