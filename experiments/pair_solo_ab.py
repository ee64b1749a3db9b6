"""In-process A/B: bench.py-style SOLO chained timing of the brick vmult
vs the benchmark_03-style INTERLEAVED constrained/plain pair, same process,
same arrays. Round-3 queue data showed bench.py at 13.9 ms/rep while
benchmark_03 measured 28 ms constrained / 22 ms plain at the identical
(nref=7, p=4, quadrant) configuration minutes later — this separates
"tunnel weather" from a structural cost of the paired protocol (two warm
executables, alternating dispatch).

  python experiments/pair_solo_ab.py [nref] [degree] [reps] [trials]

Prints per-window ms for: solo vmult, solo vmult_plain, paired vmult,
paired vmult_plain, then PAIR-SOLO-AB-DONE.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nref = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_trials = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    import jax.numpy as jnp
    import dealii_matrixfree_hanging_nodes_tpu as mfhn
    from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
    from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM
    from dealii_matrixfree_hanging_nodes_tpu.utils.timing import (
        repeat_timed,
        repeat_timed_paired,
    )

    tria = mfhn.create_quadrant(3, nref)
    mf = MatrixFree(tria, degree=degree, dtype=np.float32)
    op = BrickLaplaceMM(mf, matmul_precision=os.environ.get(
        "BENCH_PRECISION", "high"))
    rng = np.random.default_rng(0)
    src = op.from_dof_vector(rng.standard_normal(mf.n_dofs).astype(np.float32))
    scale = jnp.float32(1e-3)
    step_c = lambda x: op.vmult(x * scale)  # noqa: E731
    step_p = lambda x: op.vmult_plain(x * scale)  # noqa: E731

    def show(tag, times):
        print(f"{tag:18s} " + " ".join(f"{t*1e3:7.2f}" for t in times)
              + f"   min {min(times)*1e3:7.2f} ms", flush=True)

    # 1) solo constrained (exactly bench.py's protocol)
    rc = repeat_timed(step_c, src, n_reps=n_reps, n_trials=n_trials)
    show("solo vmult", rc.times)
    # 2) solo plain
    rp = repeat_timed(step_p, src, n_reps=n_reps, n_trials=n_trials)
    show("solo plain", rp.times)
    # 3) paired (benchmark_03's protocol)
    pc, pp = repeat_timed_paired(
        [step_c, step_p], [src, src], n_reps=n_reps, n_trials=n_trials)
    show("paired vmult", pc.times)
    show("paired plain", pp.times)
    time.sleep(10)
    # 4) solo again (weather control)
    rc2 = repeat_timed(step_c, src, n_reps=n_reps, n_trials=n_trials)
    show("solo vmult (2)", rc2.times)
    ov = [100.0 * (c / p - 1.0) for c, p in zip(pc.times, pp.times)]
    print("paired overhead %/window: "
          + " ".join(f"{w:.1f}" for w in ov))
    print(f"solo overhead (min/min): "
          f"{100.0*(min(rc.times+rc2.times)/rp.min-1.0):.1f}%")
    print("PAIR-SOLO-AB-DONE")


if __name__ == "__main__":
    main()
