"""solve_01 — end-to-end Poisson solves on the AMR geometries (BASELINE.md
row 4: CG + Chebyshev-smoothed geometric multigrid on the partitioned mesh).

Two configurations:
1. single-chip: GMG-preconditioned CG on the quadrant mesh, Dirichlet BCs,
   manufactured solution; reports iterations + errors.
2. multi-chip: plain CG with the domain-decomposed DistributedLaplace over
   all visible devices (weighted SFC partition), verifying the distributed
   operator inside a Krylov loop.

  python benchmarks/solve_01.py [nref] [degree]
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import dealii_matrixfree_hanging_nodes_tpu as mfhn
from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
from dealii_matrixfree_hanging_nodes_tpu.models.multigrid import (
    GMGPreconditioner,
    solve_cg,
)
from dealii_matrixfree_hanging_nodes_tpu.parallel.distributed import DistributedLaplace
from dealii_matrixfree_hanging_nodes_tpu.parallel.partition import (
    hanging_nodes_weighting,
)
from dealii_matrixfree_hanging_nodes_tpu.utils.table import ConvergenceTable


def run(nref: int = 3, degree: int = 2, dtype=np.float64):
    """NOTE: f64 on TPU is software-emulated with reduced effective
    precision; tight Krylov tolerances only converge on CPU. On accelerator
    platforms the driver relaxes tolerances accordingly."""
    table = ConvergenceTable()
    on_cpu = jax.default_backend() == "cpu"
    tol_gmg = 1e-10 if on_cpu else 1e-6
    tol_dist = 1e-8 if on_cpu else 1e-4

    # ---- single-chip GMG-CG
    gmg = GMGPreconditioner("quadrant", 3, nref, degree, dtype=dtype)
    op, mf = gmg.fine_op, gmg.fine_mf
    rng = np.random.default_rng(0)
    xstar = mf.constraints.distribute(rng.standard_normal(mf.n_dofs))
    xstar = np.asarray(jnp.asarray(xstar).at[op.bdofs].set(0.0))
    b = op.vmult(jnp.asarray(xstar))
    x, it_gmg, res = solve_cg(op, b, M=gmg, tol=tol_gmg, max_iter=100)
    free = ~mf.constraints.constrained_dof_marker()
    err = float(np.abs(np.asarray(x)[free] - xstar[free]).max())
    x2, it_plain, _ = solve_cg(op, b, tol=tol_gmg, max_iter=2000)
    table.add_value("solver", "GMG-CG")
    table.add_value("n_dofs", mf.n_dofs)
    table.add_value("iters", it_gmg)
    table.add_value("iters_unprec", it_plain)
    table.add_value("err", err)
    table.set_scientific("err", True)

    # ---- multi-chip CG (domain decomposition over all devices)
    mf2 = MatrixFree(mfhn.create_quadrant(3, nref), degree, dtype=dtype)
    w = hanging_nodes_weighting(mf2.constraints.is_constrained_cell(), 4.0)
    dop = DistributedLaplace(mf2, weights=w)
    src = rng.standard_normal(mf2.n_dofs)
    bb = dop.vmult(dop.scatter_vector(src))

    class _Op:
        def vmult(self, v):
            return dop.vmult(v)

    xd, it_d, res_d = solve_cg(_Op(), bb, tol=tol_dist, max_iter=2000)
    # distributed solve of A x = A src recovers src on the free dofs up to
    # the constant nullspace component; verify via residual instead
    rb = dop.gather_vector(bb) - dop.gather_vector(dop.vmult(xd))
    table.add_value("dist_devices", dop.n_ranks)
    table.add_value("dist_iters", it_d)
    table.add_value("dist_res", float(np.linalg.norm(rb)))
    table.set_scientific("dist_res", True)

    # ---- multi-chip Chebyshev-GMG-CG (BASELINE row 4): all levels,
    # smoothers, transfers, and the coarse solve run on sharded vectors
    from dealii_matrixfree_hanging_nodes_tpu.parallel.multigrid_distributed import (
        DistributedGMGPreconditioner,
    )

    dgmg = DistributedGMGPreconditioner("quadrant", 3, nref, degree, dtype=dtype)
    dfine = dgmg.fine_op
    bgd = dfine.scatter_vector(np.asarray(b))
    xgd, it_dgmg, _ = solve_cg(dfine, bgd, M=dgmg, tol=tol_gmg, max_iter=100)
    err_d = float(
        np.abs(dfine.gather_vector(xgd)[free] - xstar[free]).max()
    )
    table.add_value("dist_gmg_iters", it_dgmg)
    table.add_value("dist_gmg_err", err_d)
    table.set_scientific("dist_gmg_err", True)
    print(table.write_text())
    return table


if __name__ == "__main__":
    if jax.default_backend() == "cpu":
        # true f64 on host (outside pytest, x64 is off by default and the
        # f64 dtype silently degrades to f32, hiding the 1e-10 tolerances)
        jax.config.update("jax_enable_x64", True)
    nref = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    run(nref, degree)
