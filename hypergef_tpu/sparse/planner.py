"""Ahead-of-time tiling planner: static-shape schedules for the fused kernels.

This is the TPU-native descendant of the reference's workload balancer
(CPU schedule builder ``include/taskbalancer/balancer_kernel.cuh:229-259``
and its Python twin ``HyperGsys/balancer.py:15-33``).  The reference chops
each hyperedge's nnz range into chunks of ≤ ``ngs`` entries and emits a
*quadratic pairing* of chunks so each CUDA task has bounded work and
combines partials through atomicAdd.  TPU has no atomics and no dynamic
shapes under jit, so the plan here is different:

* the same chunk boundaries (⌈nnz_e/ngs⌉ chunks per hyperedge e) become
  rows of a padded ELL table — every chunk is exactly ``ngs`` slots wide,
  masked past its true size;
* partial sums of sibling chunks are combined by a *deterministic sorted
  segment reduction* over the (non-decreasing) chunk→edge map instead of
  atomics — no quadratic pairing, no races, exact fp reproducibility;
* the same structure is built for the vertex side (rows of H), so the
  E→V stage is also a gather + sorted segment sum.

Everything is plain integer NumPy on the host, computed once per graph
(the planner is pure — the C++ twin in ``csrc/`` produces bit-identical
tables; see :mod:`hypergef_tpu.sparse.native`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class EllTable(NamedTuple):
    """Padded ELL chunk table for one aggregation direction.

    ``gather_idx[c, k]`` is the source row to read for slot k of chunk c
    (0 for padded slots — always masked), ``mask[c, k]`` is 1.0 for live
    slots, ``seg_ids[c]`` is the (non-decreasing) output segment of chunk
    c (== num_segments for padded chunks, which sorted segment-sum
    drops), and ``seg_ptr`` maps each output segment to its chunk range.
    """

    gather_idx: np.ndarray  # [C_pad, ngs] int32
    mask: np.ndarray  # [C_pad, ngs] f32
    seg_ids: np.ndarray  # [C_pad] int32
    seg_ptr: np.ndarray  # [num_segments+1] int64 (chunk ranges, unpadded region)
    num_chunks: int  # true number of chunks (≤ C_pad)
    num_segments: int
    ngs: int


def build_ell(
    indptr: np.ndarray,
    indices: np.ndarray,
    ngs: int,
    pad_chunks_to: int = 8,
) -> EllTable:
    """Chunk CSR rows into an ELL table with ≤ ``ngs`` entries per chunk.

    Chunk boundaries are identical to the reference's ``balan_key``
    construction (``balancer.py:19-25``): row r with nnz_r entries
    contributes ⌈nnz_r/ngs⌉ chunks starting every ``ngs`` entries.
    """
    if ngs <= 0:
        raise ValueError("ngs must be positive")
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    num_rows = indptr.shape[0] - 1
    row_len = np.diff(indptr)
    chunks_per_row = -(-row_len // ngs)  # ceil
    num_chunks = int(chunks_per_row.sum())
    seg_ptr = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(chunks_per_row, out=seg_ptr[1:])

    c_pad = max(_round_up(max(num_chunks, 1), pad_chunks_to), pad_chunks_to)
    gather_idx = np.zeros((c_pad, ngs), dtype=np.int32)
    mask = np.zeros((c_pad, ngs), dtype=np.float32)
    seg_ids = np.full(c_pad, num_rows, dtype=np.int32)

    if num_chunks:
        # chunk → owning row (vectorized via searchsorted on the chunk ptr)
        chunk_row = (
            np.searchsorted(seg_ptr, np.arange(num_chunks, dtype=np.int64), side="right") - 1
        ).astype(np.int64)
        seg_ids[:num_chunks] = chunk_row.astype(np.int32)
        # start offset of each chunk inside the CSR nnz array
        chunk_rank = np.arange(num_chunks, dtype=np.int64) - seg_ptr[chunk_row]
        chunk_start = indptr[chunk_row] + chunk_rank * ngs
        chunk_size = np.minimum(indptr[chunk_row + 1] - chunk_start, ngs)
        # scatter nnz entries into the padded table
        slot = np.arange(ngs, dtype=np.int64)[None, :]
        src = chunk_start[:, None] + slot  # [num_chunks, ngs]
        live = slot < chunk_size[:, None]
        src_clipped = np.minimum(src, indices.shape[0] - 1 if indices.size else 0)
        gather_idx[:num_chunks] = np.where(live, indices[src_clipped], 0)
        mask[:num_chunks] = live.astype(np.float32)

    return EllTable(
        gather_idx=gather_idx,
        mask=mask,
        seg_ids=seg_ids,
        seg_ptr=seg_ptr,
        num_chunks=num_chunks,
        num_segments=num_rows,
        ngs=ngs,
    )


def choose_ngs(
    row_len: np.ndarray,
    min_ngs: int = 8,
    max_ngs: int = 512,
    chunk_overhead: float = 8.0,
) -> int:
    """Analytic replacement for the reference's hand-tuned per-dataset
    ``partition_dict`` (``hypergraph.py:74-76``).

    Minimizes a simple cost model over sublane-aligned candidates:
    ``padded_slots + chunk_overhead * num_chunks`` — padded slots model
    wasted VPU lanes/gather work, the per-chunk constant models segment
    bookkeeping.  TPU tiles are static, so candidates are multiples of 8
    (f32 sublane count).
    """
    row_len = np.asarray(row_len, dtype=np.int64)
    if row_len.size == 0:
        return min_ngs
    best, best_cost = min_ngs, np.inf
    for ngs in range(min_ngs, max_ngs + 1, 8):
        chunks = -(-row_len // ngs)
        cost = float((chunks * ngs).sum()) + chunk_overhead * float(chunks.sum())
        if cost < best_cost:
            best, best_cost = ngs, cost
    return best


class TilePlanData(NamedTuple):
    """jnp view of a :class:`TilePlan` (flows through jit)."""

    e_gather_idx: "object"  # [Ce, ngs_e] int32 — vertex ids feeding each edge-chunk
    e_mask: "object"  # [Ce, ngs_e] f32
    e_seg_ids: "object"  # [Ce] int32 — edge id per chunk (sorted)
    v_gather_idx: "object"  # [Cv, ngs_v] int32 — edge ids feeding each vertex-chunk
    v_mask: "object"  # [Cv, ngs_v] f32
    v_seg_ids: "object"  # [Cv] int32 — vertex id per chunk (sorted)


@dataclasses.dataclass
class TilePlan:
    """Full static schedule for the fused two-stage aggregation."""

    edge_table: EllTable  # V→E stage: chunks of H^T rows
    vertex_table: EllTable  # E→V stage: chunks of H rows
    num_nodes: int
    num_edges: int

    _device: Optional[TilePlanData] = dataclasses.field(default=None, repr=False)

    @property
    def ngs_edge(self) -> int:
        return self.edge_table.ngs

    @property
    def ngs_vertex(self) -> int:
        return self.vertex_table.ngs

    def device(self) -> TilePlanData:
        if self._device is None:
            import jax.numpy as jnp

            et, vt = self.edge_table, self.vertex_table
            self._device = TilePlanData(
                e_gather_idx=jnp.asarray(et.gather_idx),
                e_mask=jnp.asarray(et.mask),
                e_seg_ids=jnp.asarray(et.seg_ids),
                v_gather_idx=jnp.asarray(vt.gather_idx),
                v_mask=jnp.asarray(vt.mask),
                v_seg_ids=jnp.asarray(vt.seg_ids),
            )
        return self._device

    def padding_waste(self) -> float:
        """Fraction of padded (dead) gather slots across both tables."""
        et, vt = self.edge_table, self.vertex_table
        live = float(et.mask.sum() + vt.mask.sum())
        total = float(et.mask.size + vt.mask.size)
        return 1.0 - live / total if total else 0.0


def plan_tiles(
    hg,
    ngs: Optional[int] = None,
    ngs_vertex: Optional[int] = None,
    pad_chunks_to: int = 8,
) -> TilePlan:
    """Build the static two-stage schedule for a hypergraph.

    ``ngs`` defaults to the analytic rule of :func:`choose_ngs` on the
    hyperedge-size distribution (replacing the reference's per-dataset
    lookup table); the vertex side gets its own size from the vertex
    degree distribution.
    """
    if ngs is None:
        ngs = choose_ngs(hg.edge_sizes())
    if ngs_vertex is None:
        ngs_vertex = choose_ngs(hg.vertex_degrees())
    edge_table = build_ell(hg.ht_indptr, hg.ht_indices, ngs, pad_chunks_to)
    vertex_table = build_ell(hg.h_indptr, hg.h_indices, ngs_vertex, pad_chunks_to)
    return TilePlan(
        edge_table=edge_table,
        vertex_table=vertex_table,
        num_nodes=hg.num_nodes,
        num_edges=hg.num_edges,
    )
