"""Headline benchmark: 3D degree-4 Laplace vmult throughput on the quadrant
AMR geometry (the reference's flagship experiment, benchmark_03.h:382-532).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 1.0 GDoF/s/chip (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import dealii_matrixfree_hanging_nodes_tpu as mfhn
    from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
    from dealii_matrixfree_hanging_nodes_tpu.models.laplace import LaplaceOperator

    nref = int(os.environ.get("BENCH_NREF", "7"))
    degree = int(os.environ.get("BENCH_DEGREE", "4"))
    n_reps = int(os.environ.get("BENCH_REPS", "100"))
    engine = os.environ.get("BENCH_ENGINE", "bricks")
    # BENCH_DTYPE=f64 runs the whole vmult in XLA's emulated double on the
    # chip (the reference is double throughout, benchmark_01.h:148; the
    # measured accuracy of this path is 3.9e-15 vs the scipy oracle —
    # results/split_precision_ladder.txt). ~20x below f32 throughput.
    dtype_name = os.environ.get("BENCH_DTYPE", "f32")
    if dtype_name == "f64":
        import jax

        jax.config.update("jax_enable_x64", True)
    dtype = np.float64 if dtype_name == "f64" else np.float32
    default_prec = "highest" if dtype_name == "f64" else "high"

    tria = mfhn.create_quadrant(3, nref)
    mf = MatrixFree(tria, degree=degree, dtype=dtype)
    rng = np.random.default_rng(0)
    src_np = rng.standard_normal(mf.n_dofs).astype(dtype)
    if engine == "bricks":
        try:
            from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM

            op = BrickLaplaceMM(
                mf, matmul_precision=os.environ.get("BENCH_PRECISION",
                                                    default_prec)
            )
            src = op.from_dof_vector(src_np)
        except Exception as e:  # safety net: fall back to the index engine
            print(f"brick engine unavailable ({e}); falling back", file=sys.stderr)
            engine = "xla"
    if engine != "bricks":
        if engine != "xla":
            print(f"unknown BENCH_ENGINE={engine!r}; using index engine", file=sys.stderr)
        op = LaplaceOperator(mf)
        src = jnp.asarray(src_np)

    # Honest timing on remote/tunneled backends: block_until_ready can return
    # before execution completes, so (a) chain each rep on the previous result
    # and (b) close with a device-to-host fetch, which is a true sync point.
    scale = jnp.asarray(1e-3, dtype)
    r = op.vmult(src)
    _ = np.asarray(r[:1])  # compile + sync
    # best-of-N trials SPREAD OVER MINUTES: the tunneled backend's
    # throughput varies 5-10x between minute-scale weather windows (PERF.md),
    # so consecutive trials all land in one window; spacing them with short
    # gaps samples several windows and min picks the best (the reference
    # reports min over ranks, benchmark_03.h:501-507)
    n_trials = int(os.environ.get("BENCH_TRIALS", "7"))
    gap_s = float(os.environ.get("BENCH_GAP_S", "15"))
    windows = []
    for _trial in range(n_trials):
        x = src
        t0 = time.perf_counter()
        for _ in range(n_reps):
            x = op.vmult(x * scale)
        _ = np.asarray(x[:1])
        w = (time.perf_counter() - t0) / n_reps
        windows.append(w)
        if _trial + 1 < n_trials and gap_s > 0:
            time.sleep(gap_s)
    print(
        "windows_ms: " + " ".join(f"{w*1e3:.2f}" for w in windows),
        file=sys.stderr,
    )
    # Window hygiene (VERDICT r3 #9): the first window is warmup-contaminated
    # (residual compile/layout work) — discard it; the HEADLINE is the MEDIAN
    # of the remaining windows, with best-of and the full window list carried
    # alongside for transparency.
    steady = windows[1:] if len(windows) > 1 else windows
    dt = float(np.median(steady))
    gdofs = mf.n_dofs / dt / 1e9
    best = mf.n_dofs / min(steady) / 1e9
    print(
        json.dumps(
            {
                "metric": "laplace_vmult_p4_quadrant_throughput"
                + ("_f64" if dtype_name == "f64" else ""),
                "value": round(gdofs, 4),
                "unit": "GDoF/s/chip",
                "vs_baseline": round(gdofs / 1.0, 4),
                "best": round(best, 4),
                "windows_ms": [round(w * 1e3, 2) for w in windows],
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
