#!/bin/bash
# Block until the machine meets the record-eligibility loadavg gate,
# then exec the given command.  Makes the calm-window protocol
# mechanical: a measurement run launched through this wrapper cannot
# start loaded, and bench.py independently stamps `calm` in the
# artifact from its own thresholds (1-min < 0.5 AND 15-min < 2.0).
#
# The wrapper gates with MARGIN (1-min < 0.35, 15-min < 1.9 by
# default) and requires the gate met on two consecutive 30 s samples:
# the launched process's own startup (python + JVM spawn) adds ~0.1
# to the 1-min average before bench.py takes its sample, so gating at
# exactly the artifact threshold loses the calm flag to the startup
# race (observed: wrapper saw 0.12, artifact recorded 0.51).
#
# Usage: tools/wait_calm.sh <command...>
#   WAIT_CALM_L1_MAX  (default 0.35) 1-min gate with margin
#   WAIT_CALM_L15_MAX (default 1.90) 15-min gate with margin
#   WAIT_CALM_MAX_S   (default 3600) caps the wait; on timeout the
#   command still runs (the artifact will self-document calm:false).
set -u
l1max=${WAIT_CALM_L1_MAX:-0.35}
l15max=${WAIT_CALM_L15_MAX:-1.90}
max=${WAIT_CALM_MAX_S:-3600}
start=$(date +%s)
ok=0
while :; do
  read -r l1 _ l15 _ < /proc/loadavg
  if awk -v a="$l1" -v c="$l15" -v am="$l1max" -v cm="$l15max" \
       'BEGIN{exit !(a<am && c<cm)}'; then
    ok=$((ok + 1))
    if (( ok >= 2 )); then
      echo "wait_calm: gate met twice (loadavg $l1 .. $l15) after $(( $(date +%s) - start ))s" >&2
      break
    fi
  else
    ok=0
  fi
  if (( $(date +%s) - start > max )); then
    echo "wait_calm: TIMEOUT after ${max}s (loadavg $l1 .. $l15) — running anyway" >&2
    break
  fi
  sleep 30
done
exec "$@"
