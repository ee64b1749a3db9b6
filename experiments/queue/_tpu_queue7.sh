#!/bin/bash
# Queue 7: honest-protocol re-measurement after the sync_fetch fix.
# Waits for queue6 (PID in $1). Outputs into results/queue_raw/.
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
echo $$ > /tmp/q7.pid
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "=== queue7 start $(date)" >> $LOG
source <(sed -n '/^health()/,/^}/p;/^wait_health()/,/^}/p;/^job()/,/^}/p' /root/repo/_tpu_queue3.sh)

# 1) protocol-fix validation: solo and paired should now agree
job pairab2 2400 'PAIR-SOLO-AB-DONE' python experiments/pair_solo_ab.py 7 4

# 2) pool-vs-pair DSS decision with honest windows
job dss_ab2 2400 'DSS-AB-DONE' python experiments/dss_ab.py 7 4

# 3) phase ablation at r7 (where the remaining constrained-path cost is)
job eta7b 2400 'vs plain' python experiments/eta_phases.py 7 4

# 4) quadrant r8 row with honest chunked windows (137 MDoF headline row)
job b03_q8h 7200 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 8 8 5 --bricks

# 5) multi-RHS honest retime
job multi7c 2400 'per-vector' python _time_multi.py 7 8 30

echo "=== queue7 done $(date)" >> $LOG
