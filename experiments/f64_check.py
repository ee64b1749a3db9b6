"""On-chip f64-emulated accuracy check (VERDICT r4 item 6): run the
COMPLETE brick vmult in XLA's emulated double on the TPU and compare
against the host scipy f64 assembled oracle (reference is double
throughout, benchmark_01.h:148). The oracle is computed BEFORE the first
device use (host NumPy slows ~50-100x once the TPU backend initializes).

  python experiments/f64_check.py [nref] [degree]
"""

import sys

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

try:
    import dealii_matrixfree_hanging_nodes_tpu  # noqa: F401
except ModuleNotFoundError:  # checkout use without `pip install -e .`
    sys.path.insert(0, __file__.rsplit("/", 2)[0])

import dealii_matrixfree_hanging_nodes_tpu as mfhn
from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM
from dealii_matrixfree_hanging_nodes_tpu.oracle import vmult_oracle


def main(nref=4, degree=4):
    t = mfhn.create_quadrant(3, nref)
    mf = MatrixFree(t, degree, dtype=np.float64)
    rng = np.random.default_rng(0)
    src = rng.standard_normal(mf.n_dofs)
    ref = vmult_oracle(t, degree, src)  # host scipy, pre-device
    scal = np.abs(ref).max()
    bl = BrickLaplaceMM(mf, matmul_precision="highest")
    bv = bl.from_dof_vector(src)
    got = bl.to_dof_vector(bl.vmult(bv), zero_hanging=True)
    rel = float(np.abs(got - ref).max() / scal)
    print(f"backend={jax.default_backend()} n_dofs={mf.n_dofs}")
    print(f"F64CHECK rel_err={rel:.3e}")
    assert rel < 1e-12, rel


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
