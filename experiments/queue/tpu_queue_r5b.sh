#!/bin/bash
# Round-5 queue B: profile-driven follow-ups (launched after tpu_queue_r5.sh
# finishes; pass its pid as $1 to wait for it). job() skips completed markers.
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
if [ -f /tmp/q5rb.pid ] && kill -0 $(cat /tmp/q5rb.pid) 2>/dev/null; then
  echo "queue_r5b already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q5rb.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queue_r5b start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/experiments/queue/tpu_queue_r5.sh)

# per-op profile of the constrained vmult at the flagship size: what the
# residual 17% HN overhead is made of (VERDICT item 2)
job prof7r5 3600 'PROFILE-VMULT-DONE' python experiments/profile_vmult.py 7 4 30

# per-op profile at low degree (VERDICT item 1): where p=1/p=2 time goes
job prof9p1 5400 'PROFILE-VMULT-DONE' python experiments/profile_vmult.py 9 1 30
job prof8p2 5400 'PROFILE-VMULT-DONE' python experiments/profile_vmult.py 8 2 30

echo "=== queue_r5b done $(date)" >> $LOG
