#!/bin/bash
# Block until the machine meets the record-eligibility loadavg gate
# (bench.py CALM_LOAD1/CALM_LOAD15: start 1-min < 0.5 AND 15-min < 2.0),
# then exec the given command.  Makes the calm-window protocol
# mechanical: a measurement run launched through this wrapper cannot
# start loaded, and bench.py independently stamps `calm` in the
# artifact from the same thresholds.
#
# Usage: tools/wait_calm.sh <command...>
#   WAIT_CALM_MAX_S (default 3600) caps the wait; on timeout the
#   command still runs (the artifact will self-document calm:false).
set -u
max=${WAIT_CALM_MAX_S:-3600}
start=$(date +%s)
while :; do
  read -r l1 _ l15 _ < /proc/loadavg
  if awk -v a="$l1" -v c="$l15" 'BEGIN{exit !(a<0.5 && c<2.0)}'; then
    echo "wait_calm: gate met (loadavg $l1 .. $l15) after $(( $(date +%s) - start ))s" >&2
    break
  fi
  if (( $(date +%s) - start > max )); then
    echo "wait_calm: TIMEOUT after ${max}s (loadavg $l1 .. $l15) — running anyway" >&2
    break
  fi
  sleep 30
done
exec "$@"
