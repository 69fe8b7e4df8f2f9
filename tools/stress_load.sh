#!/usr/bin/env bash
# Deliberate ambient-load generator for the bench protocol's
# negative control (round-14 verdict item 1 done-criterion: a loaded
# replay must produce ZERO verified regression flags while an
# inject-sleep run still fires).
#
# Two worker shapes, matching the two probe dimensions:
#   - cpu workers: tight integer hashing loops (pins cores)
#   - mem workers: large-buffer copies (saturates memory bandwidth —
#     the dimension that produced r13's 8 phantom dedup flags)
#
# Usage: tools/stress_load.sh start [cpu_workers] [mem_workers]
#        tools/stress_load.sh stop
set -euo pipefail
PIDFILE=/tmp/graft_stress.pids
case "${1:-}" in
  start)
    CPU="${2:-8}"; MEM="${3:-8}"
    : > "$PIDFILE"
    for _ in $(seq 1 "$CPU"); do
      python3 -c '
x = 0
while True:
    for i in range(1000000): x = hash((x, i))
' & echo $! >> "$PIDFILE"
    done
    for _ in $(seq 1 "$MEM"); do
      python3 -c '
import array
a = array.array("b", bytes(256 * 1024 * 1024))
while True:
    b = a[:]            # 256 MB copy: read + write stream
    a[0] = b[0]
' & echo $! >> "$PIDFILE"
    done
    echo "started $CPU cpu + $MEM mem workers (pids in $PIDFILE)"
    ;;
  stop)
    if [ -f "$PIDFILE" ]; then
      xargs -r kill < "$PIDFILE" 2>/dev/null || true
      rm -f "$PIDFILE"
      echo "stopped"
    else
      echo "no pidfile"
    fi
    ;;
  *) echo "usage: $0 start [cpu_workers] [mem_workers] | stop"; exit 1 ;;
esac
