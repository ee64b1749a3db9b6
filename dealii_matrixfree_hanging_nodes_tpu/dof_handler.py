"""Entity-keyed DoF enumeration for continuous FE_Q(p) on the AMR forest
(capability L2: DoFHandler::distribute_dofs analog, benchmark_01.h:247).

Each of the (p+1)^dim local lattice nodes of a cell belongs to a topological
entity (vertex / edge / face / cell interior), determined per axis by whether
its lattice index is 0, p, or interior. Entities are keyed exactly with
integers at the finest-level resolution:

- point-like axis  -> corner coordinate of the node on that axis, marker 0
- interior axis    -> segment base coordinate, marker = extent * 8 + index

Two lattice nodes share a global DoF iff they share the entity key. This
reproduces deal.II's sharing rule on structured AMR: vertices are shared
across levels by geometric position, edge/face interiors only between cells
owning the *same* (equal-extent) entity — so the hanging (fine) side gets its
own DoFs, which the constraint layer then eliminates. Geometric coincidence
alone (e.g. even-p fine nodes sitting on coarse node positions) correctly
does not merge DoFs.
"""

from __future__ import annotations

import numpy as np

from .elements import shape_info
from .mesh import Triangulation

__all__ = ["DoFHandler", "local_lattice"]


def local_lattice(degree: int, dim: int) -> np.ndarray:
    """Per-axis lattice indices of local DoFs: [n_loc, dim], x fastest."""
    n = degree + 1
    n_loc = n**dim
    l = np.arange(n_loc)
    return np.stack([(l // n**a) % n for a in range(dim)], axis=1)


class DoFHandler:
    """Distributes global DoFs for FE_Q(degree) over the active cells.

    Attributes
    ----------
    cell_dofs : int64 [n_cells, n_loc]
        Global DoF indices per cell, lexicographic local ordering (x fastest).
    n_dofs : int
        Number of global DoFs (hanging DoFs included, as in deal.II).
    """

    def __init__(self, tria: Triangulation, degree: int):
        self.tria = tria
        self.degree = degree
        self.dim = tria.dim
        self.shape = shape_info(degree)
        self._distribute()

    def _distribute(self):
        tria, p, dim = self.tria, self.degree, self.dim
        n = p + 1
        lat = local_lattice(p, dim)  # [n_loc, dim]
        n_cells = tria.n_active_cells
        n_loc = n**dim
        lmax = int(tria.level.max())
        # 17-bit coordinate / 19-bit marker fields per axis: coordinates need
        # lmax+1 bits (finest-level grid has 2^lmax cells + the upper corner),
        # markers need sz*(p+1)+ia < 2^19 with sz = 2^lmax. Enforce instead of
        # silently overflowing into the neighboring field.
        if lmax > 15:
            raise ValueError(f"DoFHandler supports at most 15 levels, got {lmax}")
        if (np.int64(1) << lmax) * (p + 1) + p >= (np.int64(1) << 19):
            raise ValueError(
                f"entity-marker field overflow: degree {p} at {lmax} levels"
            )

        from . import native

        full = native.distribute_dofs(dim, p, tria.level, tria.coord)
        if full is not None:
            gids, n_dofs = full
            self.cell_dofs = gids.reshape(n_cells, n_loc)
            self.n_dofs = n_dofs
            self._lat = lat
            return

        sz = (np.int64(1) << (lmax - tria.level)).astype(np.int64)  # [n_cells]
        base = tria.coord * sz[:, None]  # [n_cells, dim] lower corner @ lmax

        # Per (cell, node, axis): coordinate + marker columns of the key.
        key1 = np.zeros((n_cells, n_loc), dtype=np.int64)
        key2 = np.zeros((n_cells, n_loc), dtype=np.int64)
        for a in range(dim):
            ia = lat[:, a][None, :]  # [1, n_loc]
            base_a = base[:, a][:, None]  # [n_cells, 1]
            sz_a = sz[:, None]
            is_lo = ia == 0
            is_hi = ia == p
            interior = ~(is_lo | is_hi)
            coord_a = base_a + np.where(is_hi, sz_a, 0)
            coord_a = np.where(interior, base_a, coord_a)
            # marker = sz*(p+1) + ia is collision-free across levels (ia < p+1,
            # sz a power of two); the earlier sz*8+ia scheme aliased for
            # degree >= 10 (e.g. sz=1,ia=9 vs sz=2,ia=1), silently merging
            # distinct interior nodes.
            marker_a = np.where(interior, sz_a * np.int64(p + 1) + ia, 0)
            # NOTE: scalar shift operands must be np.int64 — NumPy 2.0's
            # python-int promotion path is ~1000x slower on this host.
            key1 = (key1 << np.int64(17)) | coord_a
            key2 = (key2 << np.int64(19)) | marker_a

        flat1, flat2 = key1.ravel(), key2.ravel()
        from . import native

        res = native.dof_unique(flat1, flat2)
        if res is not None:
            gids, n_dofs = res
        else:
            order = np.lexsort((flat2, flat1))
            s1, s2 = flat1[order], flat2[order]
            new_group = np.empty(len(s1), dtype=bool)
            new_group[0] = True
            new_group[1:] = (np.diff(s1) != 0) | (np.diff(s2) != 0)
            gid_sorted = np.cumsum(new_group) - 1
            gids = np.empty(len(flat1), dtype=np.int64)
            gids[order] = gid_sorted
            n_dofs = int(gid_sorted[-1]) + 1

        self.cell_dofs = gids.reshape(n_cells, n_loc)
        self.n_dofs = n_dofs
        self._lat = lat

    # ------------------------------------------------------------------
    def support_points(self) -> np.ndarray:
        """Physical coordinates of each global DoF's support point [n_dofs, dim].

        Used by the analytic-function interpolation path (capability C13;
        VectorTools::interpolate analog, benchmark_03.h:362-378).
        """
        tria, dim = self.tria, self.dim
        nodes = self.shape.nodes  # GL points on [0,1]
        h = tria.cell_size()
        lower = tria.cell_lower()
        pts = np.zeros((self.n_dofs, dim))
        # per-cell node coordinates; later writers overwrite with identical
        # values. Chunked: the full coords array is n_cells*n_loc*dim
        # doubles (6.3 GB at quadrant nref=8) — far past the host's fast-
        # fault window (utils/hostmem.py) — while fixed-size chunks reuse
        # the same pages.
        loc = nodes[self._lat]  # [n_loc, dim] in unit cell
        step = max(1, 50_000_000 // loc.shape[0])
        for s in range(0, tria.n_active_cells, step):
            e = min(s + step, tria.n_active_cells)
            coords = lower[s:e, None, :] + h[s:e, None, None] * loc[None, :, :]
            pts[self.cell_dofs[s:e].ravel()] = coords.reshape(-1, dim)
        return pts

    def boundary_dofs(self) -> np.ndarray:
        """Global indices of DoFs on the domain boundary (for Dirichlet BCs)."""
        pts = self.support_points()
        tol = 1e-12
        on_b = np.any(
            (np.abs(pts - self.tria.left) < tol)
            | (np.abs(pts - self.tria.right) < tol),
            axis=1,
        )
        return np.nonzero(on_b)[0]
