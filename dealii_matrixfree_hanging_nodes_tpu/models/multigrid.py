"""Solvers (SURVEY §7 stretch / BASELINE row 4): conjugate gradients,
Chebyshev smoothing, and a global-coarsening geometric multigrid V-cycle on
the AMR hierarchy — all matrix-free on the same gather/HN-interpolate/
kernel/scatter infrastructure.

The level hierarchy follows the global-coarsening approach (the reference
author's line of work): level l is the geometry generated with l
refinements, so every active cell of level l+1 is either an active cell of
level l or a descendant of one; prolongation embeds coarse cell values with
per-axis chains of the subface matrices P0/P1 (the same tables the
hanging-node kernel uses), restriction is its exact adjoint."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..elements import shape_info
from ..matrix_free import MatrixFree
from ..mesh import create_geometry

__all__ = [
    "operator_diagonal",
    "ChebyshevSmoother",
    "Transfer",
    "GMGPreconditioner",
    "solve_cg",
    "DirichletLaplace",
]


# --------------------------------------------------------------------------
def operator_diagonal(op, mf: MatrixFree) -> jnp.ndarray:
    """Matrix-free diagonal of C^T A C via unit-vector probing per local dof
    (the MatrixFreeTools::compute_diagonal approach): for each local basis
    index l, run the constrained cell pipeline on e_l and keep entry l."""
    n_loc = mf.shape.n_dofs_per_cell(mf.dim)
    a = mf.arrays
    kernel = op.cell_kernel

    @jax.jit
    def _diag(arrays):
        def one(l, acc):
            e = jnp.zeros((mf.n_cells, n_loc), mf.dtype).at[:, l].set(1.0)
            u = mf.apply_hanging_node_constraints(e, False, arrays)
            v = kernel(u, arrays)
            v = mf.apply_hanging_node_constraints(v, True, arrays)
            contrib = jnp.zeros((mf.n_cells, n_loc), mf.dtype).at[:, l].set(v[:, l])
            return acc + contrib

        acc = jax.lax.fori_loop(
            0, n_loc, one, jnp.zeros((mf.n_cells, n_loc), mf.dtype)
        )
        dst = jnp.zeros(mf.n_dofs, mf.dtype)
        return dst.at[arrays["dofmap"].reshape(-1)].add(acc.reshape(-1))

    return _diag(a)


def laplace_diagonal_host(mf: MatrixFree) -> np.ndarray:
    """Host NumPy equivalent of operator_diagonal for the Cartesian Laplace
    (equal to the device probing to rounding): per distinct mask m the
    per-slot diagonal is diag(Q_m^T K Q_m) with Q_m the composite in-cell
    HN interpolation; contributions land at the fast dofmap. Avoids the
    per-slot device probing loop (125 gather/scatter passes) at GMG setup."""
    if mf.high_order_mapping:
        raise NotImplementedError("host diagonal assumes Cartesian mapping")
    from ..ops.hanging_nodes import hn_composite_matrix

    si, dim, p = mf.shape, mf.dim, mf.degree
    n_loc = (p + 1) ** dim
    M1 = np.einsum("q,qi,qj->ij", si.quad_w, si.S, si.S)
    K1 = np.einsum("q,qi,qj->ij", si.quad_w, si.D, si.D)
    K = np.zeros((n_loc, n_loc))
    for d in range(dim):
        facs = [K1 if t == d else M1 for t in range(dim)]
        A = facs[dim - 1]
        for t in range(dim - 2, -1, -1):
            A = np.kron(A, facs[t])
        K += A

    masks = np.asarray(mf._np["masks"])
    geo = np.asarray(mf._np["geo"])[:, 0].astype(np.float64)
    uniq, inv = np.unique(masks, return_inverse=True)
    dtab = np.empty((len(uniq), n_loc))
    for i, mv in enumerate(uniq):
        if mv == 0:
            dtab[i] = np.diag(K)
        else:
            # forward application is u @ Q (row convention), so the local
            # constrained operator is Q K Q^T and its slot diagonal is
            # sum_{ij} Q_li K_ij Q_lj — matching the device probing exactly
            Q = np.asarray(hn_composite_matrix(int(mv), si.P, dim), np.float64)
            dtab[i] = np.einsum("ki,ij,kj->k", Q, K, Q)
    diag = np.zeros(mf.n_dofs)
    dofmap = np.asarray(mf._np["dofmap"])
    step = max(1, 40_000_000 // n_loc)
    for s in range(0, mf.n_cells, step):
        e = min(s + step, mf.n_cells)
        np.add.at(
            diag, dofmap[s:e].ravel(),
            (geo[s:e, None] * dtab[inv[s:e]]).ravel(),
        )
    return diag


# --------------------------------------------------------------------------
class ChebyshevSmoother:
    """Chebyshev iteration preconditioned by the operator diagonal
    (the smoother of the reference author's multigrid papers)."""

    def __init__(self, op, diag: jnp.ndarray = None, degree: int = 4,
                 eig_ratio: float = 1.2, n_power_iters: int = 12,
                 inv_diag: jnp.ndarray = None, x_init: jnp.ndarray = None):
        """Subclasses customize the vector layout through the `_prec` /
        `_norm` hooks (e.g. BrickChebyshev refills the hanging-node
        invariant after every D^{-1}); the eigenvalue estimate and the
        three-term recurrence are shared so the variants can never drift
        apart numerically."""
        self.op = op
        self.degree = degree
        if inv_diag is None:
            safe = jnp.where(diag > 0, diag, 1.0)
            inv_diag = jnp.where(diag > 0, 1.0 / safe, 0.0)
        self.inv_diag = inv_diag
        # power iteration for lambda_max of D^{-1} A; works on any vector
        # layout (1D global or sharded padded [R, n_own_max]); device scalars
        # throughout — one host sync at the end
        x = x_init if x_init is not None else jnp.asarray(
            np.random.default_rng(7).standard_normal(inv_diag.shape),
            inv_diag.dtype,
        )
        lam = jnp.asarray(1.0, inv_diag.dtype)
        for _ in range(n_power_iters):
            y = self._prec(self.op.vmult(x))
            ny = self._norm(y)
            lam = ny / self._norm(x)
            x = y / ny
        self.lmax = float(lam) * 1.1
        self.lmin = self.lmax / (eig_ratio * 10.0)

    def _prec(self, r):
        """One D^{-1} application (hook)."""
        return self.inv_diag * r

    def _norm(self, v):
        return jnp.linalg.norm(v.reshape(-1))

    def apply(self, b: jnp.ndarray, x0=None) -> jnp.ndarray:
        """Standard three-term Chebyshev recurrence on D^{-1}(b - A x)."""
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        x = jnp.zeros_like(b) if x0 is None else x0
        r = b - self.op.vmult(x) if x0 is not None else b
        sigma = theta / delta
        rho = 1.0 / sigma
        d = self._prec(r) / theta
        for _ in range(self.degree):
            x = x + d
            r = b - self.op.vmult(x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + 2.0 * rho_new / delta * self._prec(r)
            rho = rho_new
        return x


# --------------------------------------------------------------------------
def covering_embedding(mf_coarse: MatrixFree, mf_fine: MatrixFree):
    """Per-fine-cell covering coarse active cell + per-axis embedding chain.

    Returns (cover int64 [n_f], E float [n_f, dim, n, n]) where E is the
    product of subface matrices P0/P1 along the refinement path — shared by
    the index-engine Transfer and the brick-engine BrickTransfer."""
    tc, tf = mf_coarse.tria, mf_fine.tria
    dim, p = tf.dim, mf_fine.degree
    si = shape_info(p)
    n = p + 1

    # covering coarse active cell per fine active cell (walk ancestors)
    key_order = np.argsort(tc.pack(tc.level, tc.coord), kind="stable")
    keys_sorted = np.sort(tc.pack(tc.level, tc.coord))

    n_f = tf.n_active_cells
    cover = np.full(n_f, -1, dtype=np.int64)
    diff = np.zeros(n_f, dtype=np.int64)
    lvl = tf.level.copy()
    crd = tf.coord.copy()
    for up in range(0, int(tf.level.max()) + 1):
        missing = cover < 0
        if not missing.any():
            break
        kk = tc.pack(lvl[missing], crd[missing])
        pos = np.searchsorted(keys_sorted, kk)
        pos_c = np.clip(pos, 0, len(keys_sorted) - 1)
        hit = keys_sorted[pos_c] == kk
        idx = np.nonzero(missing)[0]
        cover[idx[hit]] = key_order[pos_c[hit]]
        diff[idx[hit]] = up
        lvl[missing] = lvl[missing] - 1
        crd[missing] = crd[missing] >> np.int64(1)
    assert (cover >= 0).all(), "fine mesh does not refine coarse mesh"

    # per-cell per-axis embedding matrix E = P_{b_deep} @ ... @ P_{b_1}
    P = si.P  # [2, n, n]
    E = np.broadcast_to(np.eye(n), (n_f, dim, n, n)).copy()
    # subcell bit at depth k (from coarse+1 .. fine level): bit of coord at
    # that level = (coord >> (level - l)) & 1 for l in coarse+1..level
    maxdiff = int(diff.max()) if n_f else 0
    for k in range(maxdiff):
        # k-th step from the coarse side: level coarse+k+1
        act = diff > k
        if not act.any():
            continue
        shift = (diff[act] - 1 - k).astype(np.int64)
        for d in range(dim):
            bits = (tf.coord[act, d] >> shift) & 1
            E[act, d] = np.matmul(P[bits], E[act, d])
    return cover, E


class Transfer:
    """Prolongation/restriction between two meshes of the same geometry
    family where the fine mesh refines the coarse one (global coarsening)."""

    def __init__(self, mf_coarse: MatrixFree, mf_fine: MatrixFree):
        self.mfc, self.mff = mf_coarse, mf_fine
        tf = mf_fine.tria
        dim, p = tf.dim, mf_fine.degree
        n = p + 1
        cover, E = covering_embedding(mf_coarse, mf_fine)
        self.E = jnp.asarray(E, dtype=mf_fine.dtype)
        self.cover = jnp.asarray(cover.astype(np.int32))

        # fine-dof ownership mask: first (cell, slot) writer wins, so the
        # prolongated vector is written exactly once per fine dof
        cd_f = np.asarray(mf_fine.dof_handler.cell_dofs)
        flat = cd_f.ravel()
        order = np.argsort(flat, kind="stable")
        uniq, start = np.unique(flat[order], return_index=True)
        first_flat = order[start]  # first linear (cell,slot) per dof
        own = np.zeros(cd_f.size, dtype=bool)
        own[first_flat] = True
        self.own_mask = jnp.asarray(own.reshape(cd_f.shape))
        self._n = n
        self._dim = dim

        cfg = dict(
            cdc=mf_coarse.dofmap,  # fast map: coarse values get HN-resolved
            cdf=jnp.asarray(cd_f.astype(np.int32)),
        )
        self._cfg = cfg

    def _embed(self, u, E):
        dim, n = self._dim, self._n
        v = u.reshape(u.shape[0], *([n] * dim))
        for t in range(dim):
            ax = v.ndim - 1 - t
            v = jnp.moveaxis(v, ax, -1)
            v = jnp.einsum("mij,m...j->m...i", E[:, t], v)
            v = jnp.moveaxis(v, -1, ax)
        return v.reshape(u.shape[0], -1)

    def _embed_t(self, u, E):
        dim, n = self._dim, self._n
        v = u.reshape(u.shape[0], *([n] * dim))
        for t in reversed(range(dim)):
            ax = v.ndim - 1 - t
            v = jnp.moveaxis(v, ax, -1)
            v = jnp.einsum("mji,m...j->m...i", E[:, t], v)
            v = jnp.moveaxis(v, -1, ax)
        return v.reshape(u.shape[0], -1)

    def prolongate(self, xc: jnp.ndarray) -> jnp.ndarray:
        """coarse dof vector -> fine dof vector (consistent embedding)."""
        mfc, mff = self.mfc, self.mff
        ac = mfc.arrays
        uc = mfc.read_dof_values(xc, arrays=ac)  # [n_coarse_cells, n_loc]
        u = uc[self.cover]  # per fine cell: covering coarse local values
        uf = self._embed(u, self.E)
        out = jnp.zeros(mff.n_dofs, mff.dtype)
        flat_idx = self._cfg["cdf"].reshape(-1)
        flat_val = jnp.where(self.own_mask, uf, 0).reshape(-1)
        flat_sel = self.own_mask.reshape(-1)
        return out.at[flat_idx].add(jnp.where(flat_sel, flat_val, 0))

    def restrict(self, xf: jnp.ndarray) -> jnp.ndarray:
        """Exact adjoint of prolongate."""
        mfc, mff = self.mfc, self.mff
        uf = jnp.where(self.own_mask, xf[self._cfg["cdf"]], 0)
        u = self._embed_t(uf, self.E)
        # adjoint of the cover-gather: scatter-add into coarse cell slots
        n_c = mfc.n_cells
        acc = jnp.zeros((n_c, u.shape[1]), mfc.dtype).at[self.cover].add(u)
        return mfc.distribute_local_to_global(acc, arrays=mfc.arrays)


# --------------------------------------------------------------------------
def solve_cg(op, b, M=None, tol=1e-8, max_iter=500, dot=None):
    """(Preconditioned) conjugate gradients; returns (x, n_iters, res_norm).

    ``dot`` overrides the inner product — e.g. BrickLaplaceMM.dot, which
    weights each CG dof once across its duplicated brick copies, so CG can
    run entirely in the fast brick layout."""
    dot = dot if dot is not None else (lambda u, v: jnp.vdot(u, v))
    x = jnp.zeros_like(b)
    r = b
    z = M(r) if M else r
    p = z
    rz = dot(r, z)
    b_norm = float(jnp.sqrt(dot(b, b)))
    if b_norm == 0:
        return x, 0, 0.0
    it = 0
    for it in range(1, max_iter + 1):
        Ap = op.vmult(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        res = float(jnp.sqrt(dot(r, r)))
        if res < tol * b_norm:
            break
        z = M(r) if M else r
        rz_new = dot(r, z)
        beta = rz_new / rz
        rz = rz_new
        p = z + beta * p
    return x, it, float(jnp.sqrt(dot(r, r)))


# --------------------------------------------------------------------------
class DirichletLaplace:
    """Laplace with homogeneous Dirichlet boundary: constrained rows act as
    identity, making the operator SPD for the CG/GMG stack."""

    def __init__(self, mf: MatrixFree):
        from .laplace import laplace_cell_kernel

        self.mf = mf
        self.cell_kernel = laplace_cell_kernel(mf)
        self.bdofs = jnp.asarray(mf.dof_handler.boundary_dofs().astype(np.int32))
        kernel = self.cell_kernel

        def _vmult(src, arrays, bdofs):
            masked = src.at[bdofs].set(0.0)
            out = mf.cell_loop(kernel, masked, arrays=arrays)
            out = out.at[bdofs].set(0.0)
            return out + jnp.zeros_like(src).at[bdofs].set(src[bdofs])

        self._jit = jax.jit(_vmult)
        self._arrays = mf.arrays

    def vmult(self, src):
        return self._jit(src, self._arrays, self.bdofs)

    def project_rhs(self, b):
        """Zero Dirichlet rows of an assembled rhs."""
        return b.at[self.bdofs].set(0.0)


class GMGPreconditioner:
    """Global-coarsening geometric multigrid V-cycle preconditioner."""

    def __init__(self, geometry: str, dim: int, n_refinements: int, degree: int,
                 dtype=np.float64, n_smooth: int = 3, min_level: int = 1):
        self.levels = []
        for r in range(min_level, n_refinements + 1):
            tria = create_geometry(geometry, dim, r)
            mf = MatrixFree(tria, degree, dtype=dtype)
            self.levels.append(mf)
        self.ops = [DirichletLaplace(mf) for mf in self.levels]
        self.smoothers = []
        for op, mf in zip(self.ops, self.levels):
            diag = operator_diagonal(op, mf)
            # Dirichlet rows: diagonal 1
            diag = diag.at[op.bdofs].set(1.0)
            self.smoothers.append(ChebyshevSmoother(op, diag, degree=n_smooth))
        self.transfers = [
            Transfer(self.levels[i], self.levels[i + 1])
            for i in range(len(self.levels) - 1)
        ]

    def _vcycle(self, lvl: int, b):
        op = self.ops[lvl]
        if lvl == 0:
            x, _, _ = solve_cg(op, b, tol=1e-10, max_iter=200)
            return x
        sm = self.smoothers[lvl]
        x = sm.apply(b)
        r = b - op.vmult(x)
        r = op.project_rhs(r)
        rc = self.transfers[lvl - 1].restrict(r)
        rc = self.ops[lvl - 1].project_rhs(rc)
        xc = self._vcycle(lvl - 1, rc)
        x = x + op.project_rhs(self.transfers[lvl - 1].prolongate(xc))
        return sm.apply(b, x0=x)

    def __call__(self, b):
        return self._vcycle(len(self.levels) - 1, b)

    @property
    def fine_op(self):
        return self.ops[-1]

    @property
    def fine_mf(self):
        return self.levels[-1]
