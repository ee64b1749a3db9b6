#!/bin/bash
# Follow-on TPU queue: waits for the main queue (pid 32604), then runs the
# variant-matrix job (VERDICT r2 item 8).
cd /root/repo
LOG=/tmp/queue_log.txt
while kill -0 32606 2>/dev/null; do sleep 60; done
echo "=== queue2 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue.sh)
job varmat 10000 'FINAL-VARIANT-MATRIX' env BENCH_REPS=30 python experiments/variant_matrix.py quadrant 5 1 6
echo "=== queue2 done $(date)" >> $LOG
