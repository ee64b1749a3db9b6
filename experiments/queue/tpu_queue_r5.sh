#!/bin/bash
# Round-5 TPU queue: health-gated measurement jobs for the VERDICT r4 list.
# job() skips completed markers, so the queue is idempotent across restarts.
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
mkdir -p $RAW
if [ -f /tmp/q5r.pid ] && kill -0 $(cat /tmp/q5r.pid) 2>/dev/null; then
  echo "queue_r5 already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q5r.pid
echo "=== queue_r5 start $(date)" >> $LOG

health() {
  timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(float(np.asarray(jnp.ones((256,256)) @ jnp.ones((256,256)))[0,0]))
" 2>/dev/null | grep -q 256 && return 0 || return 1
}
wait_health() {
  for i in $(seq 1 200); do
    if health; then echo "healthy (probe $i) $(date)" >> $LOG; return 0; fi
    sleep 120
  done
  return 1
}
job() {  # job <name> <timeout> <marker> <cmd...>
  name=$1; to=$2; marker=$3; shift 3
  out=$RAW/q_$name.out
  if [ -f $out ] && grep -q "$marker" $out; then
    echo "$name already done, skipping $(date)" >> $LOG
    return 0
  fi
  for try in 1 2 3; do
    wait_health || { echo "$name: no backend" >> $LOG; return 1; }
    echo "$name try $try start $(date)" >> $LOG
    timeout $to "$@" > $out 2>&1
    if grep -q "$marker" $out; then
      echo "$name OK try $try $(date)" >> $LOG
      return 0
    fi
    echo "$name try $try FAILED $(date)" >> $LOG
    sleep 60
  done
  return 1
}

# 1) headline re-validation with round-5 code
job bench5 1800 'GDoF' python bench.py

# 2) device-resident GMG-CG timing (VERDICT item 3 done-check: s_per_iter
#    within ~3x the vmult pair at nref=6 p=4, i.e. ~20 ms not 14.8 s)
job solve6dev 7200 's_per_iter' python benchmarks/solve_01.py 6 4 --bricks

# 3) r7 p=4 overhead baseline for the <15% push (VERDICT item 2)
job b03_q7c5 5400 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 7 8 --bricks

# 4) p=1..6 at round-4 defaults (VERDICT item 1 re-measure)
job degsweep_r5 16000 'overhead_median' python experiments/degree_sweep.py quadrant 1 6

# 5) deformed flagship pair (VERDICT item 4 speed baseline)
job deform5 3600 'DONE-ALL' python experiments/deformed_perf.py 6 4

# 6) elasticity at scale: nref=7 p=4 = 52.8M component-DoFs (VERDICT item 5)
job elast7 9000 'GDoF' python benchmarks/elasticity_01.py 7 4 4 --bricks

# 7) on-chip f64-emulated accuracy + headline (VERDICT item 6)
job f64check 2400 'F64CHECK' python experiments/f64_check.py 4 4
job f64bench 3600 'GDoF' env BENCH_DTYPE=f64 BENCH_NREF=6 BENCH_TRIALS=4 python bench.py

echo "=== queue_r5 done $(date)" >> $LOG
