"""Matrix-free Laplace operator (benchmark_03.h:210-358 analog — both the
host LaplaceOperator and the CUDA LaplaceOperatorLocal/Quad functors collapse
into this one jitted cell kernel on TPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..matrix_free import MatrixFree
from ..ops.sum_factorization import evaluate_gradients, integrate_gradients

__all__ = ["LaplaceOperator", "laplace_cell_kernel"]


def laplace_cell_kernel(mf: MatrixFree):
    """Per-cell-batch quadrature kernel: u_loc -> v_loc.

    evaluate(gradients) → submit_gradient(geo * get_gradient) →
    integrate(gradients), sum-factorized (benchmark_01.h:600-608).
    """
    dim = mf.dim

    if not mf.high_order_mapping:

        def kernel(u):
            g = evaluate_gradients(u, mf.S, mf.Dc, dim)  # [c, dim, nq]
            g = g * mf.geo[:, :, None] * mf.quad_w[None, None, :]
            return integrate_gradients(g, mf.S, mf.Dc, dim)

        return kernel

    # deformed mapping: per-quad-point symmetric metric (packed upper triangle)
    iu, ju = [], []
    for a in range(dim):
        for b in range(a, dim):
            iu.append(a)
            ju.append(b)

    def kernel(u):
        g = evaluate_gradients(u, mf.S, mf.Dc, dim)
        out = [jnp.zeros_like(g[:, 0]) for _ in range(dim)]
        for k, (a, b) in enumerate(zip(iu, ju)):
            out[a] = out[a] + mf.geo[:, :, k] * g[:, b]
            if a != b:
                out[b] = out[b] + mf.geo[:, :, k] * g[:, a]
        return integrate_gradients(jnp.stack(out, axis=1), mf.S, mf.Dc, dim)

    return kernel


class LaplaceOperator:
    """vmult = cell_loop(laplace kernel); fast or legacy constraint path."""

    def __init__(self, mf: MatrixFree, constraints: bool = True, slow: bool = False):
        self.mf = mf
        self.constraints = constraints
        self.slow = slow
        kernel = laplace_cell_kernel(mf)

        def _vmult(src):
            return mf.cell_loop(kernel, src, constraints=constraints, slow=slow)

        self._vmult = jax.jit(_vmult)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        return self._vmult(src)

    def __call__(self, src: jnp.ndarray) -> jnp.ndarray:
        return self._vmult(src)
