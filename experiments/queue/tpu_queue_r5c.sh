#!/bin/bash
# Round-5 session-2 consolidated measurements (post perf surgery):
# headline bench, b03 overhead rows (q7/q8/a6), deformed pair (new
# brick-wise engine), elasticity at scale, f64 rows, device solve, and
# an op-level profile of the new low-degree path.
cd /root/repo
RAW=/root/repo/results/queue_raw
LOG=$RAW/queue_log.txt
mkdir -p $RAW
if [ -f /tmp/q5c.pid ] && kill -0 $(cat /tmp/q5c.pid) 2>/dev/null; then
  echo "queue_r5c already running" >> $LOG; exit 0
fi
echo $$ > /tmp/q5c.pid
echo "=== queue_r5c start $(date)" >> $LOG
health() {
  timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(float(np.asarray(jnp.ones((256,256)) @ jnp.ones((256,256)))[0,0]))
" 2>/dev/null | grep -q 256 && return 0 || return 1
}
wait_health() {
  for i in $(seq 1 100); do
    if health; then return 0; fi
    sleep 120
  done
  return 1
}
job() {  # job <name> <timeout> <marker> <cmd...>
  name=$1; to=$2; marker=$3; shift 3
  out=$RAW/q5c_$name.out
  if [ -f $out ] && grep -q "$marker" $out; then
    echo "$name already done, skipping $(date)" >> $LOG; return 0
  fi
  for try in 1 2; do
    wait_health || { echo "$name: no backend" >> $LOG; return 1; }
    echo "$name try $try start $(date)" >> $LOG
    timeout $to "$@" > $out 2>&1
    if grep -q "$marker" $out; then
      echo "$name OK try $try $(date)" >> $LOG; return 0
    fi
    echo "$name try $try FAILED $(date)" >> $LOG
    sleep 60
  done
}
job prof8p2 2700 'PROFILE-VMULT-DONE' python experiments/profile_vmult.py 8 2 30
job bench5 1800 'GDoF' python bench.py
job b03_q7 5400 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 7 8 --bricks
job b03_q8 5400 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 8 8 8 --bricks
job b03_a6 3600 'overhead_median' python benchmarks/benchmark_03.py annulus 4 6 6 8 --bricks
job deform5 3600 'DONE-ALL' python experiments/deformed_perf.py 6 4
job deform7 4800 'DONE-ALL' python experiments/deformed_perf.py 7 4
job elast7 9000 'GDoF' python benchmarks/elasticity_01.py 7 4 4 --bricks
job f64check 2400 'F64CHECK' python experiments/f64_check.py 4 4
job f64bench 3600 'GDoF' env BENCH_DTYPE=f64 BENCH_NREF=6 BENCH_TRIALS=4 python bench.py
job solve6dev 7200 's_per_iter' python benchmarks/solve_01.py 6 4 --bricks
job degsweep56 9000 'overhead_median' python experiments/degree_sweep.py quadrant 5 6
echo "=== queue_r5c done $(date)" >> $LOG
rm -f /tmp/q5c.pid
