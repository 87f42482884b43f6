#!/bin/bash
# Wait for the cont queue (pid in /tmp/round4_cont.pid or $1) to exit, then
# run the tail drives. Detached via setsid; stop via /tmp/round4_tail.pid.
set -u
CONT_PID="${1:?usage: chain_tail_after_cont.sh <cont-queue-pid>}"
while kill -0 "$CONT_PID" 2>/dev/null; do sleep 60; done
exec bash /root/repo/tools_drives/run_round4_tail_drives.sh \
  > /root/repo/tools_drives/logs/round4_tail.log 2>&1
