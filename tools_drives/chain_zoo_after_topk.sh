#!/bin/bash
# Wait until no run_round4_topk_flip_drives.sh is alive (and the chain
# waiting to start it is gone), then run the zoo drives.
set -u
PREV_PID="${1:?usage: chain_zoo_after_topk.sh <prev-pid>}"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_zoo_drives.sh \
  > /root/repo/tools_drives/logs/round4_zoo.log 2>&1
