#!/bin/bash
# Queue 11 (round 4): compact-chain A/B first, then the remaining queue-10
# jobs (job() skips anything whose marker already landed).
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -f /tmp/q11.pid ] && kill -0 $(cat /tmp/q11.pid) 2>/dev/null; then
  echo "queue11 already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q11.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue11 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) compact vs flat chain schedule at the flagship config (HN overhead)
job chainab7 2400 'CHAIN-AB-DONE' python experiments/chain_ab.py 7 4 quadrant input

# 2) refreshed benchmark_03 rows with the compact default (expect lower ovh)
job b03_q7c 2400 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 7 5 --bricks
job b03_q8c 3600 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 8 8 5 --bricks
job b03_a6c 2400 'overhead_median' python benchmarks/benchmark_03.py annulus 4 6 6 5 --bricks

# 3) headline with compact default
job bench4c 1800 'GDoF' python bench.py

# 4) leftover queue-10 jobs (skipped if already complete)
job fillab8p2i 3600 'FILL-AB-DONE' env FILL_AB_COMBOS=vol,hyb,inp python experiments/fill_ab.py 8 2
job fillab8p1i 3600 'FILL-AB-DONE' env FILL_AB_COMBOS=vol,hyb,inp python experiments/fill_ab.py 8 1
job varmat_q6 7200 'FINAL-VARIANT-MATRIX' python experiments/variant_matrix.py quadrant 6 1 6
job varmat_a6 7200 'FINAL-VARIANT-MATRIX' python experiments/variant_matrix.py annulus 6 1 6
job varmat_q7 14400 'FINAL-VARIANT-MATRIX' env BENCH_REPS=10 python experiments/variant_matrix.py quadrant 7 1 6

echo "=== queue11 done $(date)" >> $LOG
