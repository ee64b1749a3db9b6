"""Pure-topology detector of hanging-node-constrained cells.

Independent analog of the reference's ``Helper`` (constraint_helper.h:4-132):
it decides per cell whether it is face- or edge-constrained using ONLY mesh
topology (active-cell keys), sharing no code with the constraint/mask builder
in constraints.py. The reference cross-checks its mask-based census against
this detector (benchmark_03.h:412-432, info_01.cc:63-83); restoring that
two-oracle redundancy is the point of this module.

Logic (2:1-balanced AMR forest):
- ``is_face_constrained`` (constraint_helper.h:97-109): the cell's face
  neighbor slot at its own level is vacant, and the half-size parent slot
  across the face is an active cell one level coarser.
- ``is_edge_constrained`` (3D, constraint_helper.h:111-125): one of the
  cell's 12 edges lies ON the coarse grid (both transverse coordinates even)
  and is contained in an edge owned by an active cell one level coarser.
  This covers the cases the reference reaches through its 12x2
  line_to_children traversal (edges of children of inactive edge-neighbors),
  seen from the fine side.
"""

from __future__ import annotations

import numpy as np

from .mesh import Triangulation

__all__ = ["Helper"]


def _pack_rows(cols: list[np.ndarray], widths: list[int] | None = None) -> np.ndarray:
    """Pack small non-negative integer columns into one int64 key.

    Field widths must sum to < 64 bits (5 uniform 16-bit fields would
    silently drop the leading field)."""
    if widths is None:
        widths = [16] * len(cols)
    assert sum(widths) < 64
    key = np.zeros_like(np.asarray(cols[0]), dtype=np.int64)
    for c, w in zip(cols, widths):
        c = np.asarray(c, dtype=np.int64)
        assert int(c.max(initial=0)) < (1 << w)
        key = (key << np.int64(w)) | c
    return key


# (level, axis, t_a, t_b, seg): 4 + 2 + 17*3 = 57 bits
_EDGE_WIDTHS = [4, 2, 17, 17, 17]


class Helper:
    def __init__(self, tria: Triangulation):
        self.tria = tria
        self.dim = dim = tria.dim
        lvl = tria.level.astype(np.int64)
        coord = tria.coord.astype(np.int64)
        n = tria.n_active_cells

        # sorted keys of active cells: (level, coord...)
        self._cell_widths = [4] + [17] * dim
        self._cell_keys = np.sort(
            _pack_rows([lvl] + [coord[:, d] for d in range(dim)], self._cell_widths)
        )

        # ---- face-constrained --------------------------------------------
        face_c = np.zeros(n, dtype=bool)
        lim = np.int64(1) << lvl
        for d in range(dim):
            for side in (-1, 1):
                nc = coord.copy()
                nc[:, d] += side
                inside = (nc[:, d] >= 0) & (nc[:, d] < lim)
                ok = inside & (lvl >= 1)
                # neighbor slot vacant at own level, parent slot active
                same = self._is_active(lvl, np.maximum(nc, 0)) & ok
                parent = self._is_active(lvl - 1, np.maximum(nc, 0) >> np.int64(1)) & ok
                face_c |= ~same & parent
        self.face_constrained = face_c

        # ---- edge-constrained (3D) ---------------------------------------
        if dim == 3:
            # edge ownership keys of every active cell: (level, axis, t_a,
            # t_b, seg_start) for the 12 edges; transverse axes a < b.
            own = []
            for e in range(3):
                a, b = [x for x in range(3) if x != e]
                for sa in (0, 1):
                    for sb in (0, 1):
                        own.append(
                            _pack_rows(
                                [
                                    lvl,
                                    np.full(n, e, dtype=np.int64),
                                    coord[:, a] + sa,
                                    coord[:, b] + sb,
                                    coord[:, e],
                                ],
                                _EDGE_WIDTHS,
                            )
                        )
            edge_keys = np.sort(np.concatenate(own))

            edge_c = np.zeros(n, dtype=bool)
            for e in range(3):
                a, b = [x for x in range(3) if x != e]
                for sa in (0, 1):
                    for sb in (0, 1):
                        ta, tb = coord[:, a] + sa, coord[:, b] + sb
                        on_coarse = (ta % 2 == 0) & (tb % 2 == 0) & (lvl >= 1)
                        q = _pack_rows(
                            [
                                np.maximum(lvl - 1, 0),
                                np.full(n, e, dtype=np.int64),
                                ta >> 1,
                                tb >> 1,
                                coord[:, e] >> 1,
                            ],
                            _EDGE_WIDTHS,
                        )
                        idx = np.searchsorted(edge_keys, q)
                        idx = np.clip(idx, 0, len(edge_keys) - 1)
                        edge_c |= on_coarse & (edge_keys[idx] == q)
            self.edge_constrained = edge_c
        else:
            self.edge_constrained = np.zeros(n, dtype=bool)

    def _is_active(self, level: np.ndarray, coord: np.ndarray) -> np.ndarray:
        q = _pack_rows(
            [np.maximum(level, 0)] + [coord[:, d] for d in range(self.dim)],
            self._cell_widths,
        )
        idx = np.searchsorted(self._cell_keys, q)
        idx = np.clip(idx, 0, len(self._cell_keys) - 1)
        return self._cell_keys[idx] == q

    # ------------------------------------------------------------------
    def is_constrained(self) -> np.ndarray:
        """bool [n_cells]: face- or edge-constrained (the Helper census)."""
        return self.face_constrained | self.edge_constrained

    def census(self) -> tuple[int, int]:
        """(n_cells_hn, n_cells_n) like benchmark_03.h:415-430."""
        hn = int(self.is_constrained().sum())
        return hn, self.tria.n_active_cells - hn
