#!/usr/bin/env bash
# Load-balancing sweep (experiments-skx/run-exp4-*.sh analog): cell_loop time
# vs hanging-node cell weight, per-rank ghost/import counts to CSV.
set -e
cd "$(dirname "$0")/.."
python benchmarks/benchmark_02.py quadrant 5 4 results_exp4_quadrant
python benchmarks/benchmark_02.py annulus  6 4 results_exp4_annulus
