#!/bin/bash
# Queue 5: round-3 session-2 diagnostics. Waits for queue4 (PID in $1).
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
echo $$ > /tmp/q5.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue5 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) solo-vs-paired protocol A/B (resolves the bench 14ms vs b03 28ms split)
job pairab 2400 'PAIR-SOLO-AB-DONE' python experiments/pair_solo_ab.py 7 4

# 2) per-op profile of the constrained/plain pair at r7 (where the 18-25% goes)
job prof7 2400 'PROFILE-VMULT-DONE' python experiments/profile_vmult.py 7 4 30

# 3) multi-RHS with the k-minor DSS layout
job multi7b 2400 'per-vector' python _time_multi.py 7 8 30

# 4) per-op profile of multi vs single
job profmulti 2400 'PROFILE-MULTI-DONE' python experiments/profile_multi.py 7 4 8 20

# 5) brick GMG solve with compile warmup split out
job solve6b 3000 'iters' python benchmarks/solve_01.py 6 4 --bricks

echo "=== queue5 done $(date)" >> $LOG
