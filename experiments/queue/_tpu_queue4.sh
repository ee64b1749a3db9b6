#!/bin/bash
# Follow-on TPU queue: waits for queue3 (PID in $1) then runs the DSS A/B
# and the quadrant nref=9 reach row. Outputs into results/queue_raw/.
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue4 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# pool-vs-pair DSS decision run (PERF queue item)
job dss_ab 2400 'DSS-AB-DONE' python experiments/dss_ab.py 7 4

# quadrant refinement reach: nref=9 at p=2 (~137 MDoF, fits HBM)
job b03_q9p2 9000 'overhead_median' python benchmarks/benchmark_03.py quadrant 2 9 9 3 --bricks

echo "=== queue4 done $(date)" >> $LOG
