#!/bin/bash
# Sequential TPU benchmark queue with health-gating and per-job retry.
# Each job: wait for backend health, run with timeout, save output.
cd /root/repo
LOG=/tmp/queue_log.txt
echo "=== queue start $(date)" >> $LOG

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
  out=/tmp/q_$name.out
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

# 1) headline bench (quick, capture early)
job bench 1800 'GDoF' python bench.py

# 2) benchmark_03 brick rows r7+r8 with window protocol (items 1/5)
job b03_q78 4800 'overhead_median' python benchmarks/benchmark_03.py quadrant 4 7 8 5 --bricks

# 3) annulus r6 windows (item 1)
job b03_a6 2400 'overhead_median' python benchmarks/benchmark_03.py annulus 4 6 6 5 --bricks

# 4) multi-RHS timing at nref=7 (item 7)
job multi7 2400 'per-vector' python _time_multi.py 7 8 30

# 5) solve_01 on the brick engine at nref=6 (item 6)
job solve6 2400 'iters' python benchmarks/solve_01.py 6 4 --bricks

# 6) deformed pair (weak 7)
job deform 2400 'DONE-ALL' python experiments/deformed_perf.py 6 4

# 7) elasticity (weak 8)
job elast 2400 'DONE-ALL' python benchmarks/elasticity_01.py 5 2 4

# 8) degree sweep p=1..6 at >=10 MDoF (item 2) — long
job degsweep 10000 'overhead_median' python experiments/degree_sweep.py quadrant 1 6

# 9) annulus nref=9 row (item 5) — long setup
job b03_a9 7200 'overhead_median' python benchmarks/benchmark_03.py annulus 4 9 9 3 --bricks

echo "=== queue done $(date)" >> $LOG
