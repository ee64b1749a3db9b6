import numpy as np, jax, jax.numpy as jnp, time, sys
import dealii_matrixfree_hanging_nodes_tpu as mfhn
from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM

nref = int(sys.argv[1]); k = int(sys.argv[2]); p = int(sys.argv[3]) if len(sys.argv)>3 else 4
t = mfhn.create_geometry("quadrant", 3, nref)
mf = MatrixFree(t, p, dtype=np.float32)
bl = BrickLaplaceMM(mf)
rng = np.random.default_rng(0)
v0 = mf.constraints.distribute(rng.standard_normal(mf.n_dofs))
bv = bl.from_dof_vector(v0)
print(f"nref={nref} p={p} n_dofs {mf.n_dofs} n_bricks {bl.bs.n_bricks} n_sub {bl._n_sub}", flush=True)
single = bl.vmult(bv)
print("single ok", float(jnp.abs(single).max()), flush=True)
bvk = jnp.tile(bv[None], (k, 1, 1))
multi = bl.vmult_multi(bvk)
err = float(jnp.abs(multi[k//2] - single).max())
print(f"multi k={k} ok, err {err:.2e}", flush=True)
