#!/bin/bash
# Follow-on TPU queue: waits for the main queue to finish (pass its PID as
# $1, or no arg to start immediately), then runs the variant-matrix job
# (VERDICT r2 item 8). NOTE: a copy of this script with the main queue's
# live PID baked in is what actually runs during a session — do not edit a
# script a running bash is executing (see CLAUDE.md).
cd /root/repo
LOG=/tmp/queue_log.txt
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue2 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue.sh)
job varmat 10000 'FINAL-VARIANT-MATRIX' env BENCH_REPS=30 python experiments/variant_matrix.py quadrant 5 1 6
echo "=== queue2 done $(date)" >> $LOG
