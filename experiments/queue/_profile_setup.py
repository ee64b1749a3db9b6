"""Host-only phase profile of the benchmark_03 brick-row setup (no device)."""
import sys
import time

import numpy as np

import dealii_matrixfree_hanging_nodes_tpu as mfhn
from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM
from dealii_matrixfree_hanging_nodes_tpu.constraint_helper import Helper
from dealii_matrixfree_hanging_nodes_tpu.utils.analytic import interpolate

nref = int(sys.argv[1]) if len(sys.argv) > 1 else 8
GEO = sys.argv[2] if len(sys.argv) > 2 else "quadrant"

def tick(label, t0):
    t = time.perf_counter()
    print(f"{label:<22} {t - t0:8.1f} s", flush=True)
    return t

t0 = time.perf_counter()
tria = mfhn.create_geometry(GEO, 3, nref)
t0 = tick("create_geometry", t0)
mf = MatrixFree(tria, 4, dtype=np.float32)
t0 = tick("MatrixFree", t0)
n_hn, _ = Helper(tria).census()
t0 = tick("Helper census", t0)
src = interpolate(mf.dof_handler)
t0 = tick("interpolate", t0)
bop = BrickLaplaceMM(mf)
t0 = tick("BrickLaplaceMM", t0)
src_b = bop.from_dof_vector(src.astype(mf.dtype), to_device=False)
t0 = tick("from_dof_vector", t0)
print("n_dofs", mf.n_dofs, "n_bricks", bop.bs.n_bricks, "n_sub", bop._n_sub)
