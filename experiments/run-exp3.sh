#!/usr/bin/env bash
# Vectorization-type comparison (experiments/run-exp3*.sh analog):
# index (compact) vs sorted (categorize) vs group (masked-all) HN runners.
set -e
cd "$(dirname "$0")/.."
for vtype in index sorted group; do
  python benchmarks/benchmark_01.py quadrant 5 5 4 4 0 0 "$vtype" | tee "results_vtype_${vtype}"
done
