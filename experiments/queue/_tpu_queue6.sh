#!/bin/bash
# Queue 6: low-degree rerun with degree-adaptive brick sizes (p=1 B=16,
# p=2 B=8) + chunked-protocol overhead rows. Waits for queue5 (PID in $1).
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
echo $$ > /tmp/q6.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue6 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) p=1,2 degree-sweep rows with the new auto brick sizes
job degsweep_low 10000 'overhead_median' python experiments/degree_sweep.py quadrant 1 2

# 2) quadrant r7 p=4 with the chunked overhead protocol (50 chunk ratios)
job b03_q7chunk 3600 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 7 5 --bricks

# 3) annulus r6 with the chunked protocol
job b03_a6chunk 2400 'overhead_median' python benchmarks/benchmark_03.py annulus 4 6 6 5 --bricks

# 4) headline re-run
job bench2 1800 'GDoF' python bench.py

echo "=== queue6 done $(date)" >> $LOG
