#!/usr/bin/env bash
# Core experiment (experiments/run-exp1.sh analog): t0..t7 + eta on both
# paper geometries, degrees 1..4, results tee'd like the reference scripts.
set -e
cd "$(dirname "$0")/.."
for degree in 1 2 3 4; do
  python benchmarks/benchmark_01.py annulus  5 5 "$degree" | tee "results_annulus_${degree}"
  python benchmarks/benchmark_01.py quadrant 5 5 "$degree" | tee "results_quadrant_${degree}"
done
