"""Blocked multi-RHS vmult throughput vs single (VERDICT r2 item 7)."""
import sys
import numpy as np
import jax.numpy as jnp

import dealii_matrixfree_hanging_nodes_tpu as mfhn
from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM
from dealii_matrixfree_hanging_nodes_tpu.utils.timing import repeat_timed_paired

nref = int(sys.argv[1]) if len(sys.argv) > 1 else 6
k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

t = mfhn.create_geometry("quadrant", 3, nref)
mf = MatrixFree(t, 4, dtype=np.float32)
bl = BrickLaplaceMM(mf)
rng = np.random.default_rng(0)
src = rng.standard_normal((bl.bs.n_bricks, bl.N3p)).astype(np.float32)
bv = jnp.asarray(src)
bvk = jnp.tile(bv[None], (k, 1, 1))
scale = jnp.float32(1e-3)
print(f"nref={nref} p=4 k={k} n_dofs {mf.n_dofs} n_bricks {bl.bs.n_bricks}",
      flush=True)
res_s, res_m = repeat_timed_paired(
    [lambda x: bl.vmult(x * scale), lambda x: bl.vmult_multi(x * scale)],
    [bv, bvk], n_reps=n_reps, n_trials=3,
)
g_s = mf.n_dofs / res_s.min / 1e9
g_m = k * mf.n_dofs / res_m.min / 1e9
print(f"single    min {res_s.min*1e3:9.3f} ms  {g_s:6.3f} GDoF/s")
print(f"multi k={k} min {res_m.min*1e3:9.3f} ms  {g_m:6.3f} GDoF/s/vec-agg")
print(f"per-vector speedup x{g_m/g_s:.2f}")
