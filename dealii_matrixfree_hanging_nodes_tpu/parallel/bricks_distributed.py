"""Distributed brick engine — the flagship vmult sharded over a device mesh.

TPU-native analog of the reference's distributed cell_loop on the fast
hanging-node path (MatrixFree::cell_loop over parallel::distributed::
Triangulation with ghost exchange, benchmark_02.cc:122-209), built on the
brick layout instead of per-cell gather/scatter:

- bricks (not cells) are partitioned into contiguous weighted ranges along
  the Morton curve of brick origins (the p4est SFC-repartition analog,
  benchmark_02.cc:63-87); each device owns a padded slab [nb_max, N3p];
- the main Kronecker-separable operator and the absent-(hole-)cell
  corrections are embarrassingly brick-local: zero communication;
- cross-brick direct-stiffness summation splits interface pools into
  device-INTERNAL pools (summed locally, no traffic) and BOUNDARY pools
  (only pools whose touching bricks span devices) exchanged with one psum
  of an interface-sized buffer — the partitioner-ghost-exchange analog
  (LinearAlgebra::distributed::Vector semantics, benchmark_02.cc:164-165);
- the hanging-node constraint chain (HN^T, chained coarse-fine folds, fill)
  couples only "chain cells" (constrained cells + their coarse fold
  destinations). Their cols rows are all_gathered into one replicated
  compact buffer, the chain runs redundantly on every device (tiny
  mask-grouped matmuls), and each device scatters the delta rows of its own
  cells back into its slab. Traffic: O(n_chain_rows), independent of mesh
  volume.

All collectives (all_gather, psum) ride ICI under shard_map; the
`perform_communication=False` ablation elides them like the reference's
no-comm mode (benchmark_02.cc:204-209).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bricks import BrickLaplaceMM
from ..matrix_free import MatrixFree
from ..mesh import _interleave_bits

__all__ = ["DistributedBrickLaplace"]


def _pad_rows(rows: list[np.ndarray], fill, dtype=None) -> np.ndarray:
    """Stack variable-length 1D arrays into [R, max_len] with fill."""
    m = max((len(r) for r in rows), default=0)
    m = max(m, 1)
    out = np.full((len(rows), m), fill, dtype=dtype or np.asarray(rows[0]).dtype)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


class DistributedBrickLaplace:
    """Brick-engine Laplace vmult sharded over a 1D device mesh axis."""

    def __init__(
        self,
        mf: MatrixFree,
        devices=None,
        weights=None,
        brick_size: int | None = None,
        perform_communication: bool = True,
        axis_name: str = "bricks",
        matmul_precision: str = "high",
    ):
        """weights: optional per-CELL weights (reference's
        hanging_nodes_weighting form); brick weight = sum over its cells."""
        self.mf = mf
        self.axis_name = axis_name
        self.perform_communication = perform_communication
        self._precision = matmul_precision
        devices = devices if devices is not None else jax.devices()
        self.n_ranks = len(devices)
        self.mesh = Mesh(np.array(devices), (axis_name,))
        # single-chip engine: reused for constants (Kb/Mb/Fxy/K/E/Es/P/hn_Q)
        # and the extract/scatter/main-apply/hn-apply building blocks
        self.mm = BrickLaplaceMM(mf, brick_size, matmul_precision)
        self._setup(weights)
        self._build_step()

    # ------------------------------------------------------------- partition
    def _setup(self, weights):
        mm, mf, R = self.mm, self.mf, self.n_ranks
        bs = mm.bs
        B, dim, C = bs.B, bs.dim, bs.B**bs.dim
        N3p = mm.N3p
        nb = bs.n_bricks

        # Morton order of brick origins (level-anchored), the SFC the
        # contiguous partition ranges follow (benchmark_02.cc:63-87 analog)
        lmax = int(bs.brick_level.max())
        anchored = bs.brick_coord << (lmax - bs.brick_level[:, None])
        mkey = _interleave_bits(anchored, lmax + 1)
        order = np.lexsort((bs.brick_level, mkey))
        self.brick_order = order

        # per-brick weight = sum of present-cell weights
        if weights is None:
            cell_w = np.ones(mf.n_cells)
        else:
            cell_w = np.asarray(weights, dtype=np.float64)
        bw = np.zeros(nb)
        np.add.at(bw, bs.brick_of_cell, cell_w)
        cum = np.cumsum(bw[order])
        targets = cum[-1] * (np.arange(1, R) / R)
        cuts = np.searchsorted(cum, targets, side="right")
        rank_of_pos = np.zeros(nb, dtype=np.int32)
        for r, c in enumerate(cuts):
            rank_of_pos[c:] = r + 1
        rank_of_brick = np.empty(nb, dtype=np.int32)
        rank_of_brick[order] = rank_of_pos
        self.rank_of_brick = rank_of_brick
        self.rank_of_cell = rank_of_brick[bs.brick_of_cell]

        bricks_r = [order[rank_of_pos == r] for r in range(R)]
        self.bricks_r = bricks_r
        self.nb_r = np.array([len(b) for b in bricks_r])
        self.nb_max = nb_max = max(int(self.nb_r.max()), 1)
        # global brick id per slab row (pad -> brick 0, masked out everywhere)
        self.slab_brick = _pad_rows(bricks_r, 0, np.int64)  # [R, nb_max]
        slab_valid = _pad_rows(
            [np.ones(len(b), bool) for b in bricks_r], False, bool
        )
        self.slab_valid = slab_valid
        # slab position of each global brick
        self.slabpos_of_brick = np.full(nb, -1, dtype=np.int64)
        for r in range(R):
            self.slabpos_of_brick[bricks_r[r]] = np.arange(len(bricks_r[r]))

        dt = mf.dtype
        np_ = mm._np_arrays
        geo_r = np.zeros((R, nb_max), dtype=dt)
        nv_r = np.zeros((R, nb_max, N3p), dtype=bool)
        dotm_r = np.zeros((R, nb_max, N3p), dtype=dt)
        dot_mask = np.zeros((nb, N3p), dtype=dt)
        dot_mask[:, : mm.N3] = bs.dot_mask.reshape(nb, mm.N3)
        geo_g = np.asarray(np_["geo"])
        nv_g = np.asarray(np_["node_valid"])
        for r in range(R):
            k = len(bricks_r[r])
            geo_r[r, :k] = geo_g[bricks_r[r]]
            nv_r[r, :k] = nv_g[bricks_r[r]]
            dotm_r[r, :k] = dot_mask[bricks_r[r]]

        # ---- DSS pools: internal (local sum) vs boundary (psum) ----------
        def split_pools(pool_id, n_pools):
            """pool_id [nb, k] -> per-rank internal ids + global boundary ids.

            Internal pools (all touching bricks on one rank) get per-rank
            local slots; boundary pools get a shared global numbering whose
            buffer is psum'd — the only cross-device DSS traffic. Boundary
            (and pad-brick) entries carry flag=1 / int slot 0; their internal
            writes and reads are masked by the flag, so no sentinels are
            needed on the internal side."""
            owner_min = np.full(n_pools, R, dtype=np.int64)
            owner_max = np.full(n_pools, -1, dtype=np.int64)
            rk = np.broadcast_to(rank_of_brick[:, None], pool_id.shape)
            np.minimum.at(owner_min, pool_id.reshape(-1), rk.reshape(-1))
            np.maximum.at(owner_max, pool_id.reshape(-1), rk.reshape(-1))
            is_bnd = owner_min != owner_max
            bnd_ids = np.cumsum(is_bnd) - 1  # global boundary slot
            n_bnd = int(is_bnd.sum())
            int_id_r = np.zeros((R, nb_max, pool_id.shape[1]), np.int32)
            bnd_id_r = np.full((R, nb_max, pool_id.shape[1]), n_bnd, np.int32)
            bnd_flag_r = np.ones((R, nb_max, pool_id.shape[1]), dtype=dt)
            n_int_max = 1
            for r in range(R):
                pids = pool_id[bricks_r[r]]  # [nb_r, k]
                internal = ~is_bnd[pids]
                upool, local = np.unique(pids[internal], return_inverse=True)
                n_int_max = max(n_int_max, len(upool))
                li = np.zeros(pids.shape, np.int32)
                li[internal] = local.astype(np.int32)
                k = len(bricks_r[r])
                int_id_r[r, :k] = li
                bi = np.full(pids.shape, n_bnd, np.int32)
                bi[~internal] = bnd_ids[pids[~internal]].astype(np.int32)
                bnd_id_r[r, :k] = bi
                bnd_flag_r[r, :k] = (~internal).astype(dt)
                # pad bricks keep flag=1 / bnd slot n_bnd (trash): their
                # surface values are zero and their read-backs are masked by
                # node_valid downstream
            return dict(
                int_id=int_id_r,
                bnd_id=bnd_id_r,
                bnd_flag=bnd_flag_r,
                n_int=n_int_max,
                n_bnd=n_bnd,
            )

        self.pools_f = split_pools(bs.face_pool_id, bs.n_face_pools)
        self.pools_c = split_pools(bs.corner_pool_id, bs.n_corner_pools)
        if dim == 3:
            self.pools_e = split_pools(bs.edge_pool_id, bs.n_edge_pools)
        else:
            self.pools_e = None
        self.n_bnd_total = (
            self.pools_f["n_bnd"]
            + self.pools_c["n_bnd"]
            + (self.pools_e["n_bnd"] if self.pools_e else 0)
        )

        # ---- exceptional subset per rank ----------------------------------
        # exc bricks of rank r = its bricks containing absent / chain cells
        absent_lin = np.nonzero(~bs.present)[0]
        chain_lin = set(bs.hn_lin.tolist())
        for g in bs.transfer_groups:
            chain_lin.update(g.coarse_cells.tolist())
        exc_bricks_g = sorted(
            set((absent_lin // C).tolist()) | {int(x) // C for x in chain_lin}
        )
        sub_r = [
            np.array(
                [self.slabpos_of_brick[b] for b in exc_bricks_g
                 if rank_of_brick[b] == r],
                dtype=np.int64,
            )
            for r in range(R)
        ]
        # local subset slot of a global brick (for chain/absent indexing)
        sub_slot_of_brick = np.full(nb, -1, dtype=np.int64)
        for r in range(R):
            gb = self.slab_brick[r, sub_r[r]] if len(sub_r[r]) else []
            sub_slot_of_brick[gb] = np.arange(len(sub_r[r]))
        self.n_sub_max = n_sub_max = max(max((len(s) for s in sub_r), default=0), 1)
        self.sub_ids_r = _pad_rows(sub_r, 0, np.int32)  # slab rows
        # one-hot scatter subset -> slab (pad columns all-zero)
        Ssub_r = np.zeros((R, nb_max, n_sub_max), dtype=dt)
        geo_cell_sub_r = np.zeros((R, n_sub_max * C), dtype=dt)
        absent_keep_r = np.ones((R, n_sub_max * C, 1), dtype=dt)
        geo_cell_g = np.repeat(geo_g, C)  # per brick-cell
        for r in range(R):
            for j, slab_row in enumerate(sub_r[r]):
                Ssub_r[r, slab_row, j] = 1.0
                gb = self.slab_brick[r, slab_row]
                geo_cell_sub_r[r, j * C : (j + 1) * C] = geo_cell_g[
                    gb * C : (gb + 1) * C
                ]
                pres = bs.present[gb * C : (gb + 1) * C]
                absent_keep_r[r, j * C : (j + 1) * C, 0] = pres.astype(dt)
        self.Ssub_r = Ssub_r

        # ---- chain rows: global replicated buffer layout ------------------
        # chain cells: xfer cells (mask-sorted, matching mm's hn composite
        # ranges) followed by fold coarse-destinations not already included
        xfer = bs.hn_lin  # mask-sorted brick-cell linear ids
        extra = sorted(chain_lin - set(xfer.tolist()))
        chain_cells_g = np.concatenate([xfer, np.array(extra, dtype=np.int64)])
        rank_of_chain = rank_of_brick[chain_cells_g // C]
        chain_r = [chain_cells_g[rank_of_chain == r] for r in range(R)]
        self.n_chain_max = n_chain_max = max(
            max((len(c) for c in chain_r), default=0), 1
        )
        # buffer gid of each chain cell: device-major [R * n_chain_max]
        gid_of_lin = {}
        for r in range(R):
            for j, lin in enumerate(chain_r[r]):
                gid_of_lin[int(lin)] = r * n_chain_max + j
        # per-rank source rows in the local subset cols numbering
        chain_src_r = np.zeros((R, n_chain_max), dtype=np.int32)
        chain_valid_r = np.zeros((R, n_chain_max, 1), dtype=dt)
        for r in range(R):
            for j, lin in enumerate(chain_r[r]):
                gb, slot = int(lin) // C, int(lin) % C
                chain_src_r[r, j] = sub_slot_of_brick[gb] * C + slot
                chain_valid_r[r, j, 0] = 1.0
        self.chain_src_r = chain_src_r

        # chain structure in buffer gids (replicated, static)
        self.hn_sub_g = np.array(
            [gid_of_lin[int(x)] for x in xfer], dtype=np.int32
        )
        levels = sorted({g.level for g in bs.transfer_groups})
        self._levels = levels
        n = bs.p + 1
        n_loc = n**dim
        groups_g = {lv: [] for lv in levels}
        for g in bs.transfer_groups:
            T = np.zeros((n_loc, n_loc))
            T[g.src_slots, g.dst_slots] = 1.0
            groups_g[g.level].append(
                dict(
                    fine=np.array([gid_of_lin[int(x)] for x in g.fine_cells],
                                  dtype=np.int32),
                    coarse=np.array([gid_of_lin[int(x)] for x in g.coarse_cells],
                                    dtype=np.int32),
                    T=np.asarray(T, dtype=dt),
                )
            )
        xfer_levels = np.asarray(mf.tria.level[bs.xfer_cells])
        level_zero_g = {}
        for lv in levels:
            sel = xfer_levels == lv
            level_zero_g[lv] = dict(
                lin=np.asarray(self.hn_sub_g[sel]),
                keep=np.asarray(
                    1.0 - bs.hn_closure[sel].astype(np.float64), dtype=dt
                ),
            )

        # fill coverage per rank (hn writers among the rank's subset bricks)
        hn_rank = rank_of_brick[(bs.hn_lin // C)]
        fill_invden_r = np.zeros((R, n_sub_max, N3p))
        for r in range(R):
            sel = bs.hn_lin[hn_rank == r]
            den = np.zeros((n_sub_max, N3p))
            for lin in sel:
                gb, slot = int(lin) // C, int(lin) % C
                den[sub_slot_of_brick[gb], mm.slot_idx[slot]] += 1.0
            fill_invden_r[r] = np.where(den > 0, 1.0 / np.maximum(den, 1.0), 0.0)

        self.has_chain = len(chain_cells_g) > 0 and len(xfer) > 0

        # ghost/import statistics (benchmark_02.cc:136-165 analog): per rank,
        # boundary-pool values exchanged with other ranks plus remote chain
        # rows received through the replicated buffer
        fsize = (bs.NB - 2) ** (dim - 1)
        esize = bs.NB - 2 if dim == 3 else 0
        self.n_ghost = np.zeros(R, dtype=np.int64)
        self.n_import = np.zeros(R, dtype=np.int64)
        for pools, size in (
            (self.pools_f, fsize),
            (self.pools_e, esize),
            (self.pools_c, 1),
        ):
            if pools is None:
                continue
            for r in range(R):
                nb_bnd = int((pools["bnd_flag"][r][slab_valid[r]] > 0).sum())
                self.n_ghost[r] += nb_bnd * size
                self.n_import[r] += nb_bnd * size
        # chain rows owned elsewhere arrive via the all_gather
        n_chain_of_rank = np.array([len(c) for c in chain_r], dtype=np.int64)
        self.n_ghost += (len(chain_cells_g) - n_chain_of_rank) * n_loc
        self.n_import += n_chain_of_rank * (R - 1) * n_loc

        self._dev = dict(
            geo=geo_r,
            node_valid=nv_r,
            dot_mask=dotm_r,
            sub_ids=self.sub_ids_r,
            Ssub=Ssub_r,
            geo_cell_sub=geo_cell_sub_r,
            absent_keep=absent_keep_r,
            chain_src=chain_src_r,
            chain_valid=chain_valid_r,
            fill_invden=fill_invden_r.astype(dt),
            fp_int=self.pools_f["int_id"],
            fp_bnd=self.pools_f["bnd_id"],
            fp_flag=self.pools_f["bnd_flag"],
            cp_int=self.pools_c["int_id"],
            cp_bnd=self.pools_c["bnd_id"],
            cp_flag=self.pools_c["bnd_flag"],
        )
        if self.pools_e:
            self._dev.update(
                ep_int=self.pools_e["int_id"],
                ep_bnd=self.pools_e["bnd_id"],
                ep_flag=self.pools_e["bnd_flag"],
            )
        self._rep = dict(
            hn_sub_g=self.hn_sub_g,
            transfers=groups_g,
            level_zero=level_zero_g,
        )
        self._staged = False

    def _stage(self):
        if not self._staged:
            spec = NamedSharding(self.mesh, P(self.axis_name))
            self._dev_s = {
                k: jax.device_put(jnp.asarray(v), spec)
                for k, v in self._dev.items()
            }
            rep = NamedSharding(self.mesh, P())
            self._rep_s = jax.device_put(
                jax.tree.map(jnp.asarray, self._rep), rep
            )
            self._mm_a = jax.device_put(self.mm._stage(), rep)
            self._staged = True
        return self._dev_s, self._rep_s, self._mm_a

    # --------------------------------------------------------------- pieces
    def _dss_local(self, surf, d):
        """Per-device DSS: internal pools locally, boundary pools via psum."""
        bs = self.mm.bs
        dim, NB = bs.dim, bs.NB
        nb = surf.shape[0]
        ax = self.axis_name
        comm = self.perform_communication
        nf = 2 * dim
        fsize = (NB - 2) ** (dim - 1)
        parts = []
        off = 0

        def pooled(block, int_id, bnd_id, flag, n_int, n_bnd, size):
            # block [nb, k, size]; ids [nb, k]
            k = block.shape[1]
            flat = block.reshape(-1, size)
            w_int = (1.0 - flag.reshape(-1, 1)) * flat
            w_bnd = flag.reshape(-1, 1) * flat
            ipool = jnp.zeros((n_int, size), surf.dtype)
            ipool = ipool.at[int_id.reshape(-1)].add(w_int)
            bpool = jnp.zeros((n_bnd + 1, size), surf.dtype)
            bpool = bpool.at[bnd_id.reshape(-1)].add(w_bnd)
            if comm and n_bnd:
                bpool = jax.lax.psum(bpool, ax)
            new = jnp.where(
                flag.reshape(-1, 1) > 0,
                bpool[bnd_id.reshape(-1)],
                ipool[int_id.reshape(-1)],
            )
            return new.reshape(nb, k * size)

        fblock = surf[:, : nf * fsize].reshape(nb, nf, fsize)
        parts.append(
            pooled(fblock, d["fp_int"], d["fp_bnd"], d["fp_flag"],
                   self.pools_f["n_int"], self.pools_f["n_bnd"], fsize)
        )
        off = nf * fsize
        if dim == 3:
            esize = NB - 2
            eblock = surf[:, off : off + 12 * esize].reshape(nb, 12, esize)
            parts.append(
                pooled(eblock, d["ep_int"], d["ep_bnd"], d["ep_flag"],
                       self.pools_e["n_int"], self.pools_e["n_bnd"], esize)
            )
            off += 12 * esize
        ncorner = 2**dim
        cblock = surf[:, off : off + ncorner].reshape(nb, ncorner, 1)
        parts.append(
            pooled(cblock, d["cp_int"], d["cp_bnd"], d["cp_flag"],
                   self.pools_c["n_int"], self.pools_c["n_bnd"], 1)
        )
        return jnp.concatenate(parts, axis=1)

    # ------------------------------------------------------------------ step
    def _build_step(self):
        mm = self.mm
        C = mm.bs.B ** mm.bs.dim
        ax = self.axis_name
        comm = self.perform_communication
        n_chain_max = self.n_chain_max
        R = self.n_ranks

        def step(bv, d, rep, a):
            # bv [1, nb_max, N3p] local slab; squeeze the mesh axis
            bv = bv[0]
            d = jax.tree.map(lambda x: x[0], d)
            # 1) main path + per-brick scale (local)
            v = mm._main_apply(bv, a) * d["geo"][:, None]

            # 2) corrections on the local exceptional subset
            u_sub = jnp.take(bv, d["sub_ids"], axis=0)
            cols_u = mm._extract_cols(u_sub, a)
            plain = jnp.dot(cols_u, a["K"].T, preferred_element_type=bv.dtype)
            plain = plain * d["geo_cell_sub"][:, None]
            # absent (hole) cells contribute nothing: local zeroing
            final = plain * d["absent_keep"]
            dcols = final - plain
            if self.has_chain:
                # compact chain rows -> replicated buffer (the only volume
                # exchange; device-major gids match all_gather layout)
                block = jnp.take(final, d["chain_src"], axis=0) * d["chain_valid"]
                if comm:
                    buf = jax.lax.all_gather(block, ax, tiled=True)
                else:
                    buf = jnp.tile(block, (R, 1))
                buf0 = buf
                own = jnp.take(buf, rep["hn_sub_g"], axis=0)
                buf = buf.at[rep["hn_sub_g"]].set(
                    mm._hn_apply(own, a, transpose=True)
                )
                for lv in sorted(self._levels, reverse=True):
                    rows_all, coarse_all = [], []
                    for g in rep["transfers"][lv]:
                        rows_all.append(
                            jnp.dot(jnp.take(buf, g["fine"], axis=0), g["T"],
                                    preferred_element_type=bv.dtype)
                        )
                        coarse_all.append(g["coarse"])
                    lz = rep["level_zero"][lv]
                    zeroed = jnp.take(buf, lz["lin"], axis=0) * lz["keep"]
                    buf = buf.at[jnp.concatenate(coarse_all)].add(
                        jnp.concatenate(rows_all, axis=0)
                    )
                    buf = buf.at[lz["lin"]].set(zeroed)
                delta = buf - buf0
                # own block: static slice via axis_index
                r = jax.lax.axis_index(ax)
                dblock = jax.lax.dynamic_slice_in_dim(
                    delta, r * n_chain_max, n_chain_max, axis=0
                )
                dcols = dcols.at[d["chain_src"]].add(dblock * d["chain_valid"])
            v = v + jnp.dot(d["Ssub"], mm._scatter_cols(dcols, a),
                            preferred_element_type=bv.dtype)

            # 3) cross-brick DSS: internal pools local, boundary pools psum'd
            surf = jnp.dot(v, a["Es"].T, preferred_element_type=bv.dtype)
            surf_new = self._dss_local(surf, d)
            v = jnp.where(
                d["node_valid"],
                v + jnp.dot(surf_new - surf, a["Es"],
                            preferred_element_type=bv.dtype),
                0.0,
            )

            # 4) fill pass (restore the distributed-hanging invariant)
            if self.has_chain:
                v_sub = jnp.take(v, d["sub_ids"], axis=0)
                cols2_loc = mm._extract_cols(v_sub, a)
                block2 = (
                    jnp.take(cols2_loc, d["chain_src"], axis=0)
                    * d["chain_valid"]
                )
                if comm:
                    cols2 = jax.lax.all_gather(block2, ax, tiled=True)
                else:
                    cols2 = jnp.tile(block2, (R, 1))
                orig_rows = jnp.take(cols2, rep["hn_sub_g"], axis=0)
                for lv in sorted(self._levels):
                    lz = rep["level_zero"][lv]
                    cols2 = cols2.at[lz["lin"]].set(
                        jnp.take(cols2, lz["lin"], axis=0) * lz["keep"]
                    )
                    rows_all, fine_all = [], []
                    for g in rep["transfers"][lv]:
                        rows_all.append(
                            jnp.dot(jnp.take(cols2, g["coarse"], axis=0),
                                    g["T"].T,
                                    preferred_element_type=bv.dtype)
                        )
                        fine_all.append(g["fine"])
                    cols2 = cols2.at[jnp.concatenate(fine_all)].add(
                        jnp.concatenate(rows_all, axis=0)
                    )
                sub2 = mm._hn_apply(
                    jnp.take(cols2, rep["hn_sub_g"], axis=0), a,
                    transpose=False,
                )
                dbuf = jnp.zeros_like(cols2).at[rep["hn_sub_g"]].set(
                    sub2 - orig_rows
                )
                r = jax.lax.axis_index(ax)
                dblock = jax.lax.dynamic_slice_in_dim(
                    dbuf, r * n_chain_max, n_chain_max, axis=0
                )
                dcols2 = jnp.zeros_like(cols2_loc).at[d["chain_src"]].add(
                    dblock * d["chain_valid"]
                )
                num = mm._scatter_cols(dcols2, a)
                v = v + jnp.dot(d["Ssub"], num * d["fill_invden"],
                                preferred_element_type=bv.dtype)
            return v[None]

        spec = P(ax)
        rspec = P()
        self._step = jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(spec, spec, rspec, rspec),
                out_specs=spec,
            )
        )

    # ------------------------------------------------------------------ api
    def from_dof_vector(self, u: np.ndarray) -> jnp.ndarray:
        """Global dof vector -> sharded brick slabs [R, nb_max, N3p]."""
        mm = self.mm
        bv = np.zeros((self.n_ranks, self.nb_max, mm.N3p), dtype=self.mf.dtype)
        bs = mm.bs
        u_dist = self.mf.constraints.distribute(np.asarray(u))
        flat = np.zeros(bs.n_bricks * mm.N3, dtype=self.mf.dtype)
        flat[bs.node_valid] = u_dist[bs.node_dof[bs.node_valid]]
        flat = flat.reshape(bs.n_bricks, mm.N3)
        for r in range(self.n_ranks):
            k = len(self.bricks_r[r])
            bv[r, :k, : mm.N3] = flat[self.bricks_r[r]]
        return jax.device_put(
            bv, NamedSharding(self.mesh, P(self.axis_name))
        )

    def to_dof_vector(self, bv, zero_hanging: bool = False) -> np.ndarray:
        """Sharded slabs -> global dof vector (owner-copy reads)."""
        mm, bs = self.mm, self.mm.bs
        arr = np.asarray(bv)  # [R, nb_max, N3p]
        glob = np.zeros((bs.n_bricks, mm.N3), dtype=arr.dtype)
        for r in range(self.n_ranks):
            k = len(self.bricks_r[r])
            glob[self.bricks_r[r]] = arr[r, :k, : mm.N3]
        u = glob.reshape(-1)[bs.owner_node_of_dof]
        if zero_hanging:
            u = u.copy()
            u[self.mf.constraints.constrained_dof_marker()] = 0.0
        return u

    def vmult(self, bv):
        prec = {"default": "default", "high": "tensorfloat32",
                "highest": "highest"}.get(self._precision, self._precision)
        d, rep, a = self._stage()
        with jax.default_matmul_precision(prec):
            return self._step(bv, d, rep, a)

    # dot products over the reduced space (owner copies counted once)
    def dot(self, u, v):
        d, _, _ = self._stage()
        return jnp.sum(d["dot_mask"] * u * v)

    def norm(self, u):
        return jnp.sqrt(self.dot(u, u))
