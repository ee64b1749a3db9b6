import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["benchmark_02.py", "quadrant", "5", "4",
            "results/benchmark_02_quadrant_8dev_bricks_halo", "--bricks", "--coarse"]
exec(open("benchmarks/benchmark_02.py").read())
