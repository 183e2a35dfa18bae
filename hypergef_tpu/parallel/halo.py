"""Boundary (halo) exchange planning for fully-sharded aggregation.

The scalable multi-chip design (BASELINE.json north star: "edge
partitioning … exchanging boundary vertex features via all-to-all"):

* hyperedges are partitioned contiguously by nnz (as in
  :mod:`hypergef_tpu.parallel.partition`);
* vertices get *owners*: contiguous equal blocks of ⌈N/D⌉;
* shard d touches vertex set T_d (members of its local edges).  The
  boundary sets  S[d][d'] = T_d ∩ owned(d')  drive BOTH directions of
  communication:

      halo:    owner d' sends X rows S[d][d'] to worker d   (features in)
      return:  worker d sends partial rows S[d][d'] to owner d' (partials out)

  so per-layer communication is 2·Σ|S| — proportional to the cut, not
  to |V| (the previous full-psum path moved D·N·F).

Every structure is padded to static shapes and stacked on a leading
device axis; the owner-side accumulation of incoming partials is — like
everything else in this framework — a scatter-free reduction tree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hypergef_tpu.parallel.partition import edge_partition_bounds
from hypergef_tpu.sparse.planner import TreeStage, build_tree, choose_ngs


def _round_up(x, m):
    return -(-x // m) * m


def _stack_stages(stages, seg_to, fan):
    from hypergef_tpu.parallel.partition import _unify_stages

    return _unify_stages(stages, seg_to, fan)


@dataclasses.dataclass
class HaloPlan:
    """Static SPMD plan for fully-sharded halo aggregation."""

    n_shards: int
    num_nodes: int
    num_edges: int
    n_own: int  # owned vertices per shard (= ceil(N/D), padded)
    t_max: int  # max touched-set size
    b_cap: int  # boundary capacity per (src, dst) pair
    e_pad: int  # padded local edge count
    edge_bounds: np.ndarray
    # local edge-stage over compact touched-vertex ids: [D, ...] stacked
    e_levels: list
    e_final_idx: np.ndarray
    e_final_mask: np.ndarray
    e_counts: np.ndarray
    # local vertex-stage: rows = compact touched ids, inputs = local edges
    v_levels: list
    v_final_idx: np.ndarray  # [D, t_max]
    v_final_mask: np.ndarray
    # exchange maps
    send_slot: np.ndarray  # [D, D, b_cap] int32 — compact T index to send to dst
    send_mask: np.ndarray  # [D, D, b_cap] f32
    halo_send_slot: np.ndarray  # [D, D, b_cap] int32 — owner-local X row to send to dst d
    halo_idx: np.ndarray  # [D, t_max] int32 — flat recv slot per compact T index
    # owner-side combine: inputs = flat [D*b_cap] received partial slots
    own_levels: list
    own_final_idx: np.ndarray  # [D, n_own]
    own_final_mask: np.ndarray
    degE: np.ndarray  # [D, e_pad, 1]
    degV_own: np.ndarray  # [D, n_own, 1]
    _device: Optional[tuple] = dataclasses.field(default=None, repr=False)

    def device(self):
        if self._device is None:
            import jax.numpy as jnp

            j = jnp.asarray
            self._device = (
                tuple((j(g), j(m)) for g, m in self.e_levels),
                j(self.e_final_idx), j(self.e_final_mask), j(self.e_counts),
                tuple((j(g), j(m)) for g, m in self.v_levels),
                j(self.v_final_idx), j(self.v_final_mask),
                j(self.send_slot), j(self.send_mask),
                j(self.halo_send_slot), j(self.halo_idx),
                tuple((j(g), j(m)) for g, m in self.own_levels),
                j(self.own_final_idx), j(self.own_final_mask),
                j(self.degE), j(self.degV_own),
            )
        return self._device

    def comm_fraction(self) -> float:
        """Boundary traffic / full-replication traffic (lower = better)."""
        boundary = float(self.send_mask.sum())
        return boundary / max(self.n_shards * self.num_nodes, 1)


def plan_halo(hg, n_shards: int, fan: int = 8) -> HaloPlan:
    D = n_shards
    bounds = edge_partition_bounds(hg, D)
    n_own = _round_up(hg.num_nodes, D) // D
    ngs = choose_ngs(hg.edge_sizes(), min_ngs=4, max_ngs=64, step=4)
    ngs_v = choose_ngs(hg.vertex_degrees(), min_ngs=4, max_ngs=64, step=4)

    touched = []  # per shard: sorted global touched vertex ids
    e_stages, v_stages = [], []
    e_pad = int((bounds[1:] - bounds[:-1]).max())
    for d in range(D):
        e0, e1 = int(bounds[d]), int(bounds[d + 1])
        lo, hi = int(hg.ht_indptr[e0]), int(hg.ht_indptr[e1])
        members = hg.ht_indices[lo:hi].astype(np.int64)
        sizes = np.diff(hg.ht_indptr[e0 : e1 + 1])
        T = np.unique(members)
        touched.append(T)
        compact = np.searchsorted(T, members)  # member → compact id
        # local CSR of H^T with compact vertex ids
        ht_indptr = np.zeros(max(e1 - e0, 1) + 1, dtype=np.int64)
        np.cumsum(sizes, out=ht_indptr[1 : e1 - e0 + 1])
        if e1 == e0:
            ht_indptr[:] = 0
        e_stages.append(
            build_tree(ht_indptr, compact.astype(np.int32), max(len(T), 1), ngs, fan)
        )
        # local CSR of H restricted to touched rows (compact) × local edges
        e_local = np.repeat(np.arange(e1 - e0, dtype=np.int64), sizes)
        order = np.lexsort((e_local, compact))
        h_indices = e_local[order].astype(np.int32)
        h_indptr = np.zeros(max(len(T), 1) + 1, dtype=np.int64)
        np.add.at(h_indptr, compact + 1, 1)
        np.cumsum(h_indptr, out=h_indptr)
        v_stages.append(
            build_tree(h_indptr, h_indices, max(e1 - e0, 1), ngs_v, fan)
        )

    t_max = max(max(len(T) for T in touched), 1)
    # boundary sets and capacity
    S = [[None] * D for _ in range(D)]
    b_cap = 1
    for d in range(D):
        owner_of = touched[d] // n_own
        for dp in range(D):
            S[d][dp] = touched[d][owner_of == dp]
            b_cap = max(b_cap, len(S[d][dp]))
    b_cap = _round_up(b_cap, 8)

    send_slot = np.zeros((D, D, b_cap), dtype=np.int32)
    send_mask = np.zeros((D, D, b_cap), dtype=np.float32)
    halo_send_slot = np.zeros((D, D, b_cap), dtype=np.int32)
    halo_idx = np.zeros((D, t_max), dtype=np.int32)
    own_stages = []
    for d in range(D):
        T = touched[d]
        for dp in range(D):
            s = S[d][dp]
            k = len(s)
            send_slot[d, dp, :k] = np.searchsorted(T, s)
            send_mask[d, dp, :k] = 1.0
            # halo direction: OWNER dp sends X rows S[d][dp] to shard d
            halo_send_slot[dp, d, :k] = (s - dp * n_own).astype(np.int32)
        # halo: shard d receives from owner dp the rows S[d][dp] at
        # recv[dp, :|S|]; compact T index t lives at flat slot
        # dp*b_cap + rank within S[d][owner(t)]
        owner_of = T // n_own
        for dp in range(D):
            sel = np.nonzero(owner_of == dp)[0]
            halo_idx[d, sel] = (dp * b_cap + np.arange(len(sel))).astype(np.int32)
    # owner-side combine: shard dp receives partial rows for owned
    # vertices from every source d at flat slot d*b_cap + rank(S[d][dp])
    for dp in range(D):
        rows = []  # (owned_local_vertex, flat_slot)
        for d in range(D):
            s = S[d][dp]
            loc = s - dp * n_own
            rows.append(
                np.stack([loc, d * b_cap + np.arange(len(s))], axis=1)
                if len(s)
                else np.zeros((0, 2), dtype=np.int64)
            )
        rows = np.concatenate(rows, axis=0) if rows else np.zeros((0, 2), np.int64)
        order = np.argsort(rows[:, 0], kind="stable")
        rows = rows[order]
        indptr = np.zeros(n_own + 1, dtype=np.int64)
        np.add.at(indptr, rows[:, 0] + 1, 1)
        np.cumsum(indptr, out=indptr)
        own_stages.append(
            build_tree(indptr, rows[:, 1].astype(np.int32), D * b_cap, 4, fan)
        )

    e_levels, e_fi, e_fm, e_cn = _stack_stages(e_stages, e_pad, fan)
    v_levels, v_fi, v_fm, _ = _stack_stages(v_stages, t_max, fan)
    own_levels, own_fi, own_fm, _ = _stack_stages(own_stages, n_own, fan)

    degE = np.zeros((D, e_pad, 1), dtype=np.float32)
    for d in range(D):
        e0, e1 = int(bounds[d]), int(bounds[d + 1])
        degE[d, : e1 - e0] = hg.degE[e0:e1]
    degV_own = np.ones((D, n_own, 1), dtype=np.float32)
    degv = hg.degV
    for d in range(D):
        lo = d * n_own
        hi = min((d + 1) * n_own, hg.num_nodes)
        if hi > lo:
            degV_own[d, : hi - lo] = degv[lo:hi]

    plan = HaloPlan(
        n_shards=D,
        num_nodes=hg.num_nodes,
        num_edges=hg.num_edges,
        n_own=n_own,
        t_max=t_max,
        b_cap=b_cap,
        e_pad=e_pad,
        edge_bounds=bounds,
        e_levels=e_levels, e_final_idx=e_fi, e_final_mask=e_fm, e_counts=e_cn,
        v_levels=v_levels, v_final_idx=v_fi, v_final_mask=v_fm,
        send_slot=send_slot, send_mask=send_mask,
        halo_send_slot=halo_send_slot, halo_idx=halo_idx,
        own_levels=own_levels, own_final_idx=own_fi, own_final_mask=own_fm,
        degE=degE, degV_own=degV_own,
    )
    plan.device()
    return plan
