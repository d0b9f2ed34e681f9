#!/bin/bash
# Rolling sf10 stress sweep: runs check_correctness over gate chunks so one
# failure/OOM can't kill the whole sweep, and pauses when disk is low.
# Usage: scripts/sweep_sf10.sh gates.txt [chunk_size]
#        MODE=differential scripts/sweep_sf10.sh gates.txt [chunk_size]
# MODE=differential swaps the DuckDB-oracle compare for the engine-vs-engine
# A/B digest check (scripts/selfcheck_differential.py) — for gates whose
# oracles cannot complete at sf10 (pagerank family, q_ewma, q_edit_distance).
set -u
GATES_FILE=$1
CHUNK=${2:-12}
CHECKER=${MODE:-oracle}
if [ "$CHECKER" = "differential" ]; then
  CHECK_SCRIPT=scripts/selfcheck_differential.py
else
  CHECK_SCRIPT=scripts/check_correctness.py
fi
SF=${SF_DIR:-/root/repo/.stress/sf10}
LOG_DIR=${LOG_DIR:-/tmp/sf10_sweep}
mkdir -p "$LOG_DIR"
mapfile -t GATES < "$GATES_FILE"
total=${#GATES[@]}
i=0
chunk_no=0
while [ $i -lt $total ]; do
  # wait for disk headroom (spills can linger until the JVM exits)
  while true; do
    free_gb=$(df -BG / | awk 'NR==2 {gsub("G","",$4); print $4}')
    [ "$free_gb" -ge 25 ] && break
    echo "[sweep] low disk (${free_gb}G) — waiting 60s" >> "$LOG_DIR/sweep.log"
    sleep 60
  done
  chunk=("${GATES[@]:$i:$CHUNK}")
  chunk_no=$((chunk_no+1))
  log="$LOG_DIR/chunk_${chunk_no}.log"
  echo "[sweep] chunk $chunk_no: ${chunk[*]}" >> "$LOG_DIR/sweep.log"
  timeout 7200 python "$CHECK_SCRIPT" "$SF" "${chunk[@]}" > "$log" 2>&1
  echo "[sweep] chunk $chunk_no exit=$?" >> "$LOG_DIR/sweep.log"
  tr '\r' '\n' < "$log" | grep -E '\.\. q_|queries,|^OK|^FAIL|gates,' >> "$LOG_DIR/results.log"
  i=$((i+CHUNK))
done
echo "[sweep] DONE" >> "$LOG_DIR/sweep.log"
