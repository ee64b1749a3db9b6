"""On-chip A/B of two constrained-path mechanisms (brick engine):

- auto_layout: AOT compile with AUTO operand layouts + device_put re-stage
  (kills the per-rep relayout copies the device profile measured at
  ~10 ms/rep, results/queue_raw/q_prof7.out) vs the plain-jit path.
- use_ssub: subset write-back as the [nb, n_sub] one-hot matmul vs the
  .at[sub_ids].add row scatter (the 2e11 threshold was tuned with the
  fetch-contaminated protocol; row scatter is ~0.1 us/row honest).

Times constrained vmult for the four combinations interleaved in one
process (utils.timing.repeat_timed_paired, post-sync_fetch protocol) and
cross-checks exactness on-device first.

  python experiments/layout_ssub_ab.py [nref] [degree] [geometry]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import dealii_matrixfree_hanging_nodes_tpu as mfhn  # noqa: E402
from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree  # noqa: E402
from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM  # noqa: E402
from dealii_matrixfree_hanging_nodes_tpu.utils.timing import (  # noqa: E402
    repeat_timed_paired,
)


def main(nref=7, degree=4, geometry="quadrant"):
    t = mfhn.create_geometry(geometry, 3, nref)
    mf = MatrixFree(t, degree, dtype=np.float32)
    combos = [
        ("layout0_ssub1", dict(auto_layout=False, use_ssub=True)),
        ("layout1_ssub1", dict(auto_layout=True, use_ssub=True)),
        ("layout0_ssub0", dict(auto_layout=False, use_ssub=False)),
        ("layout1_ssub0", dict(auto_layout=True, use_ssub=False)),
    ]
    ops = {n: BrickLaplaceMM(mf, **kw) for n, kw in combos}
    rng = np.random.default_rng(0)
    op0 = ops[combos[0][0]]
    src = rng.standard_normal((op0.bs.n_bricks, op0.N3p)).astype(np.float32)
    bv0 = jnp.asarray(src)
    scale = jnp.float32(1e-3)

    ref = np.asarray(op0.vmult(bv0 * scale))
    for n, op in ops.items():
        d = np.abs(np.asarray(op.vmult(bv0 * scale)) - ref).max()
        aot = getattr(op, "_aot_vmult", None) is not None
        print(f"{n}: max|diff|={d:.3e}  aot_active={aot}")

    names = list(ops)
    n_dofs = mf.n_dofs
    for trial in range(3):
        results = repeat_timed_paired(
            [(lambda x, o=ops[n]: o.vmult(x * scale)) for n in names],
            [bv0] * len(names), n_reps=40, n_trials=2)
        base = results[0].min
        print(f"-- window {trial}")
        for n, r in zip(names, results):
            print(f"{n:15s} min {r.min*1e3:8.3f} ms  avg {r.avg*1e3:8.3f} ms"
                  f"  {n_dofs/r.min/1e9:6.3f} GDoF/s"
                  f"  vs base {100*(r.min/base-1):+6.2f}%")
    print("LAYOUT-SSUB-AB-DONE")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 7,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4,
         sys.argv[3] if len(sys.argv) > 3 else "quadrant")
