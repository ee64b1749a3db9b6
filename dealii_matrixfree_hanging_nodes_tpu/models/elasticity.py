"""Vector-valued linear elasticity operator (SURVEY §7 stretch / BASELINE
configs): matrix-free vmult of

    a(u, v) = ∫ 2 mu eps(u):eps(v) + lambda (div u)(div v)

on the same AMR + hanging-node infrastructure as the Laplace operator. The
solution vector is [n_dofs, dim] (one displacement component per column);
gather/scatter and HN interpolation act row-wise, so the scalar constraint
machinery applies unchanged per component."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..matrix_free import MatrixFree
from ..ops.sum_factorization import evaluate_gradients, integrate_gradients

__all__ = ["ElasticityOperator"]


class ElasticityOperator:
    def __init__(self, mf: MatrixFree, mu: float = 1.0, lam: float = 1.0,
                 constraints: bool = True):
        if mf.high_order_mapping:
            raise NotImplementedError("elasticity currently uses Cartesian mapping")
        import numpy as np

        geo = mf._np["geo"]
        if not np.allclose(geo, geo[:, :1]):
            # the mixed strain terms below fold the per-axis factors as
            # sqrt(geo_a * geo_c) == geo, valid only when all axes share one
            # factor (cube cells — true for every hyper_cube geometry here)
            raise NotImplementedError(
                "ElasticityOperator requires equal-axis (cube) cells; "
                "anisotropic mappings need per-pair geometric factors"
            )
        self.mf = mf
        self.mu = float(mu)
        self.lam = float(lam)
        self.constraints = constraints
        dim = mf.dim

        def kernel(u, a):
            # u: [cells, n_loc, dim] -> gradients per component
            grads = [
                evaluate_gradients(u[:, :, c], a["S"], a["Dc"], dim)
                for c in range(dim)
            ]  # each [cells, dim(deriv), nq], reference-space derivatives
            # reference->physical: cartesian diag Jacobian: d/dx_d = (2/h_d) d/dref_d;
            # geo[:, d] = detJ / h_d^2 already contains detJ and two 1/h factors —
            # split it: per-axis 1/h = sqrt(geo_d/detJ)... For equal-h cells,
            # geo[:, d] = h^(dim-2) for all d; physical grad_d = ref_grad_d / h with
            # quadrature factor w_q * detJ. Combine into the same contracted form
            # as the Laplace kernel: each term (d_a u_c)(d_a v_c) carries geo[:, a].
            mu2 = 2.0 * self.mu
            out = [
                [jnp.zeros_like(grads[0][:, 0]) for _ in range(dim)]
                for _ in range(dim)
            ]  # out[c][a] multiplies test-gradient d_a v_c
            w = a["quad_w"][None, :]
            # eps(u):eps(v) = sum_{c,a} 1/2 (d_a u_c + d_c u_a) * 1/2 (...) * 2
            #   -> 2 mu eps:eps = mu sum_{c,a} (d_a u_c + d_c u_a) d_a v_c
            for c in range(dim):
                for ax in range(dim):
                    term = self.mu * (grads[c][:, ax] + grads[ax][:, c])
                    # geometric factor for (ref-grad ax)*(ref-grad ax) terms is
                    # geo[:, ax]; mixed (d_c u_a)(d_a v_c) carries
                    # sqrt(geo_a*geo_c) = geo (equal axes on cubes).
                    out[c][ax] = out[c][ax] + term * a["geo"][:, ax, None] * w
            # lambda div u div v
            div = sum(grads[c][:, c] for c in range(dim))
            for c in range(dim):
                out[c][c] = out[c][c] + self.lam * div * a["geo"][:, c, None] * w
            res = []
            for c in range(dim):
                qg = jnp.stack(out[c], axis=1)  # [cells, dim, nq]
                res.append(integrate_gradients(qg, a["S"], a["Dc"], dim))
            return jnp.stack(res, axis=-1)  # [cells, n_loc, dim]

        def _vmult(src, arrays):
            # component-wise gather + HN resolve, then the coupled kernel
            a = arrays
            cols_in = []
            for c in range(dim):
                cols_in.append(mf.read_dof_values(src[:, c], arrays=a)
                               if constraints else
                               mf.read_dof_values_plain(src[:, c], arrays=a))
            u = jnp.stack(cols_in, axis=-1)
            v = kernel(u, a)
            cols = []
            for c in range(dim):
                if constraints:
                    cols.append(mf.distribute_local_to_global(v[:, :, c], arrays=a))
                else:
                    cols.append(
                        mf.distribute_local_to_global_plain(v[:, :, c], arrays=a)
                    )
            return jnp.stack(cols, axis=-1)

        self._jit = jax.jit(_vmult)
        self._arrays = mf.arrays

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """src: [n_dofs, dim] displacement vector."""
        return self._jit(src, self._arrays)
