#!/bin/bash
# Queue 10 (round 4): input-fill default validation + honest headline rows +
# the reference-scale benchmark_01 t-matrix (VERDICT r3 items 1, 5, 6, 9).
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -f /tmp/q10.pid ] && kill -0 $(cat /tmp/q10.pid) 2>/dev/null; then
  echo "queue10 already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q10.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue10 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) headline with the input-fill default (expect ~1.2 GDoF/s median)
job bench4i 1800 'GDoF' python bench.py

# 2) refreshed benchmark_03 window rows with the input default
job b03_q7i 2400 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 7 5 --bricks
job b03_a6i 2400 'overhead_median' python benchmarks/benchmark_03.py annulus 4 6 6 5 --bricks
job b03_q8i 3600 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 8 8 5 --bricks

# 3) low-degree fill retune: does input/hybrid beat volume at r8 p<=2?
job fillab8p2i 3600 'FILL-AB-DONE' env FILL_AB_COMBOS=vol,hyb,inp python experiments/fill_ab.py 8 2
job fillab8p1i 3600 'FILL-AB-DONE' env FILL_AB_COMBOS=vol,hyb,inp python experiments/fill_ab.py 8 1

# 4) reference-scale benchmark_01 t-matrix (honest, post fetch-sync fix):
#    quadrant r6/r7 + annulus r6, degrees 1..6, all four runners
job varmat_q6 7200 'FINAL-VARIANT-MATRIX' python experiments/variant_matrix.py quadrant 6 1 6
job varmat_a6 7200 'FINAL-VARIANT-MATRIX' python experiments/variant_matrix.py annulus 6 1 6
job varmat_q7 14400 'FINAL-VARIANT-MATRIX' env BENCH_REPS=10 python experiments/variant_matrix.py quadrant 7 1 6

echo "=== queue10 done $(date)" >> $LOG
