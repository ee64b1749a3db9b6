#!/bin/bash
# Queue 9: volume-fill + subset-first-order A/B and refreshed headline rows.
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -f /tmp/q9.pid ] && kill -0 $(cat /tmp/q9.pid) 2>/dev/null; then
  echo "queue9 already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q9.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue9 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) fill-mode A/B at the flagship config (old exchange vs new volume fill)
job fillab7 3600 'FILL-AB-DONE' python experiments/fill_ab.py 7 4

# 2) the low-degree catastrophe cases (honest overhead was 178%/422%)
job fillab8p2 3600 'FILL-AB-DONE' python experiments/fill_ab.py 8 2
job fillab8p1 3600 'FILL-AB-DONE' python experiments/fill_ab.py 8 1

# 3) annulus r6 (80% constrained cells)
job fillab_a6 2400 'FILL-AB-DONE' python experiments/fill_ab.py 6 4 annulus

# 4) refreshed benchmark_03 window rows with the new default
job b03_q7v 2400 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 7 5 --bricks
job b03_q8v 3600 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 8 8 5 --bricks
job b03_a6v 2400 'overhead_median' python benchmarks/benchmark_03.py annulus 4 6 6 5 --bricks

# 5) headline
job bench4 1800 'GDoF' python bench.py

echo "=== queue9 done $(date)" >> $LOG
