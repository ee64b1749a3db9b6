#!/bin/bash
# Queue 8: layout/ssub A/B + multi-RHS size ladder. Waits for queue7 (PID in $1).
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -f /tmp/q8.pid ] && kill -0 $(cat /tmp/q8.pid) 2>/dev/null; then
  echo "queue8 already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q8.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue8 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) AOT-layout and ssub-vs-rowscatter decision matrix at the flagship config
job layoutab 3600 'LAYOUT-SSUB-AB-DONE' python experiments/layout_ssub_ab.py 7 4

# 2) multi-RHS where amortization should win: below the volume-bound regime
job multi5 1800 'per-vector' python _time_multi.py 5 8 40
job multi6 1800 'per-vector' python _time_multi.py 6 8 40

# 3) headline with AOT layouts in effect
job bench3 1800 'GDoF' python bench.py

echo "=== queue8 done $(date)" >> $LOG
