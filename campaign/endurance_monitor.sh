#!/bin/bash
# RSS + step-cadence monitor for the endurance run (VERDICT r3 missing #3).
# Usage: monitor.sh <logfile-of-trainer> <out.csv>
# Samples every 30 s: epoch-time, trainer RSS (KB), host MemAvailable (KB),
# last step seen in the log.
LOG=$1
OUT=$2
echo "ts,rss_kb,memavail_kb,last_step" >> "$OUT"
while true; do
  pid=$(pgrep -f "train_wrapper.py" | head -1)
  rss=$( [ -n "$pid" ] && ps -o rss= -p "$pid" | tr -d ' ' || echo 0)
  avail=$(awk '/MemAvailable/{print $2}' /proc/meminfo)
  step=$(grep -oE "step [0-9]+" "$LOG" 2>/dev/null | tail -1 | awk '{print $2}')
  echo "$(date +%s),$rss,$avail,${step:-0}" >> "$OUT"
  sleep 30
done
