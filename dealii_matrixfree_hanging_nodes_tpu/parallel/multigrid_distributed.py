"""Multi-chip Chebyshev-smoothed geometric multigrid (BASELINE row 4).

Distributes the global-coarsening GMG stack (models/multigrid.py) over a
device mesh: every level's Laplace operator is a DistributedLaplace with
Dirichlet rows masked in the sharded padded numbering, the Chebyshev
smoother runs on sharded vectors unchanged (elementwise + operator
applications only), and the level transfers run under shard_map — each
device prolongates/restricts the FINE cells it owns, reading coarse values
through one all_gather of the (smaller) coarse shard and returning
contributions with one psum_scatter, the same collective pattern as the
operator's ghost exchange (the reference distributes transfers through the
same partitioner machinery as the operator, benchmark_02.cc:122-133).

Padded dof vectors are permutations of the global vector plus zero padding,
so jnp.vdot over sharded padded vectors equals the global dot product — the
single-chip solve_cg runs on distributed vectors verbatim.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..matrix_free import MatrixFree
from ..mesh import create_geometry
from ..models.multigrid import (
    ChebyshevSmoother,
    DirichletLaplace,
    Transfer,
    operator_diagonal,
    solve_cg,
)
from ..ops.hanging_nodes import apply_hanging_node_constraints
from .distributed import DistributedLaplace

__all__ = [
    "DistributedDirichletLaplace",
    "DistributedTransfer",
    "DistributedGMGPreconditioner",
]


def _pad_cells(arr, rank_of_cell, R, fill=0):
    """Per-rank padded stack of a per-cell array: [R, m_max, ...]."""
    counts = np.bincount(rank_of_cell, minlength=R)
    m = max(int(counts.max()), 1)
    out = np.full((R, m) + arr.shape[1:], fill, dtype=arr.dtype)
    for r in range(R):
        sel = rank_of_cell == r
        out[r, : counts[r]] = arr[sel]
    return out


class DistributedDirichletLaplace:
    """DistributedLaplace with homogeneous Dirichlet rows acting as identity
    (the SPD operator of the GMG stack), on sharded padded vectors."""

    def __init__(self, mf: MatrixFree, devices=None, weights=None,
                 axis_name: str = "cells"):
        self.mf = mf
        self.dop = DistributedLaplace(
            mf, devices=devices, weights=weights, axis_name=axis_name
        )
        bd = mf.dof_handler.boundary_dofs()
        mask = np.zeros(self.dop.n_padded, dtype=bool)
        mask[self.dop.padded_id[bd]] = True
        self.bmask = jax.device_put(
            mask.reshape(self.dop.n_ranks, self.dop.n_own_max),
            NamedSharding(self.dop.mesh, P(axis_name)),
        )

    def vmult(self, src):
        masked = jnp.where(self.bmask, 0.0, src)
        out = self.dop.vmult(masked)
        return jnp.where(self.bmask, src, out)

    def project_rhs(self, b):
        return jnp.where(self.bmask, 0.0, b)

    def scatter_vector(self, u):
        return self.dop.scatter_vector(u)

    def gather_vector(self, v):
        return self.dop.gather_vector(v)


class DistributedTransfer:
    """Sharded prolongation/restriction between two distributed levels.

    Each device handles the fine cells its fine-level operator owns; the
    coarse shard is all_gathered (coarse vectors are ~2^dim x smaller), the
    per-cell subface-chain embedding runs locally, and contributions return
    via psum_scatter. Exact adjoint pair, bitwise-matching the single-chip
    Transfer up to summation order."""

    def __init__(self, tr: Transfer, dop_c: DistributedLaplace,
                 dop_f: DistributedLaplace):
        self.tr = tr
        mfc, mff = tr.mfc, tr.mff
        dopc = dop_c.dop if isinstance(dop_c, DistributedDirichletLaplace) else dop_c
        dopf = dop_f.dop if isinstance(dop_f, DistributedDirichletLaplace) else dop_f
        R = dopf.n_ranks
        ax = dopf.axis_name
        rank_f = dopf.rank_of_cell

        cover = np.asarray(tr.cover)
        cdc = np.asarray(mfc._np["dofmap"])  # coarse fast dofmap (old ids)
        covmap = dopc.padded_id[cdc[cover]].astype(np.int32)  # [n_f, n_loc]
        cdf_pad = dopf.padded_id[np.asarray(mff._np["dofmap_plain"])].astype(
            np.int32
        )
        cov_masks = np.asarray(mfc._np["masks"])[cover].astype(np.int32)
        E = np.asarray(tr.E)
        own = np.asarray(tr.own_mask).astype(E.dtype)

        dev = dict(
            covmap=_pad_cells(covmap, rank_f, R),
            cdf=_pad_cells(cdf_pad, rank_f, R),
            cov_masks=_pad_cells(cov_masks, rank_f, R),
            # zero-padded E annihilates pad-cell rows; own=0 masks them too
            E=_pad_cells(E, rank_f, R, fill=0),
            own=_pad_cells(own, rank_f, R),
        )
        sharding = NamedSharding(dopf.mesh, P(ax))
        self._dev = {k: jax.device_put(jnp.asarray(v), sharding)
                     for k, v in dev.items()}

        n_padded_c, n_padded_f = dopc.n_padded, dopf.n_padded
        P_tab = jnp.asarray(mfc._np["P"])
        dim = mfc.dim
        embed, embed_t = tr._embed, tr._embed_t

        def _prolong(xc, covmap, E, own, masks, cdf):
            full = jax.lax.all_gather(xc[0], ax, tiled=True)  # [n_padded_c]
            u = full[covmap[0]]
            u = apply_hanging_node_constraints(u, masks[0], P_tab, dim, False)
            uf = embed(u, E[0]) * own[0]
            contrib = jnp.zeros(n_padded_f, uf.dtype)
            contrib = contrib.at[cdf[0].reshape(-1)].add(uf.reshape(-1))
            return jax.lax.psum_scatter(
                contrib, ax, scatter_dimension=0, tiled=True
            )[None]

        def _restrict(xf, covmap, E, own, masks, cdf):
            full = jax.lax.all_gather(xf[0], ax, tiled=True)  # [n_padded_f]
            uf = full[cdf[0]] * own[0]
            u = embed_t(uf, E[0])
            u = apply_hanging_node_constraints(u, masks[0], P_tab, dim, True)
            contrib = jnp.zeros(n_padded_c, u.dtype)
            contrib = contrib.at[covmap[0].reshape(-1)].add(u.reshape(-1))
            return jax.lax.psum_scatter(
                contrib, ax, scatter_dimension=0, tiled=True
            )[None]

        spec = P(ax)
        specs = (spec,) * 6
        self._prolong = jax.jit(
            jax.shard_map(_prolong, mesh=dopf.mesh, in_specs=specs,
                          out_specs=spec)
        )
        self._restrict = jax.jit(
            jax.shard_map(_restrict, mesh=dopf.mesh, in_specs=specs,
                          out_specs=spec)
        )

    def prolongate(self, xc):
        d = self._dev
        return self._prolong(
            xc, d["covmap"], d["E"], d["own"], d["cov_masks"], d["cdf"]
        )

    def restrict(self, xf):
        d = self._dev
        return self._restrict(
            xf, d["covmap"], d["E"], d["own"], d["cov_masks"], d["cdf"]
        )


class DistributedGMGPreconditioner:
    """Global-coarsening GMG V-cycle over a device mesh — every level
    operator, smoother, transfer, and the coarse solve run on sharded
    vectors (BASELINE row 4 configuration)."""

    def __init__(self, geometry: str, dim: int, n_refinements: int,
                 degree: int, devices=None, dtype=np.float64,
                 n_smooth: int = 3, min_level: int = 1, weights_fn=None):
        self.levels = []
        self.ops = []
        for r in range(min_level, n_refinements + 1):
            tria = create_geometry(geometry, dim, r)
            mf = MatrixFree(tria, degree, dtype=dtype)
            w = weights_fn(mf) if weights_fn else None
            self.levels.append(mf)
            self.ops.append(
                DistributedDirichletLaplace(mf, devices=devices, weights=w)
            )
        self.smoothers = []
        for op, mf in zip(self.ops, self.levels):
            # diagonal probed once on the single-chip path (setup is
            # host-side throughout this framework), then sharded
            diag = operator_diagonal(DirichletLaplace(mf), mf)
            diag = np.asarray(diag).copy()
            diag[mf.dof_handler.boundary_dofs()] = 1.0
            self.smoothers.append(
                ChebyshevSmoother(op, op.scatter_vector(diag), degree=n_smooth)
            )
        self.transfers = [
            DistributedTransfer(
                Transfer(self.levels[i], self.levels[i + 1]),
                self.ops[i].dop,
                self.ops[i + 1].dop,
            )
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
