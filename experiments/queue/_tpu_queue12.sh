#!/bin/bash
# Queue 12 (round 4): honest degree sweep with the round-4 defaults,
# annulus r9 reach row, brick elasticity row, deformed flagship pair, then
# the remaining variant-matrix jobs (job() skips completed markers).
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -f /tmp/q12.pid ] && kill -0 $(cat /tmp/q12.pid) 2>/dev/null; then
  echo "queue12 already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q12.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queue12 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) headline re-validation with the final round-4 code
job bench4d 1800 'GDoF' python bench.py

# 2) p=1..6 at >=10 MDoF with input-fill + compact chains (VERDICT weak 6)
job degsweep_r4 12000 'overhead_median' python experiments/degree_sweep.py quadrant 1 6

# 3) largest-fitting single-chip row, honest protocol (VERDICT missing 3)
job b03_a9 7200 'overhead_median' python benchmarks/benchmark_03.py annulus 2 9 9 4 --bricks

# 4) brick-engine elasticity row (VERDICT next item 10)
job elast6b 3600 'overhead_median' python benchmarks/elasticity_01.py 6 4 4 --bricks

# 5) deformed flagship pair (VERDICT weak/next item 8)
job deform74 3600 'DONE-ALL' python experiments/deformed_perf.py 7 4

# 6) remaining t-matrix jobs at reference scale (VERDICT item 5)
job varmat_a6 7200 'FINAL-VARIANT-MATRIX' python experiments/variant_matrix.py annulus 6 1 6
job varmat_q7 14400 'FINAL-VARIANT-MATRIX' env BENCH_REPS=10 python experiments/variant_matrix.py quadrant 7 1 6

echo "=== queue12 done $(date)" >> $LOG
