"""Community reordering: locality-creating vertex/hyperedge renumbering.

The reference vendors (but never calls) Rabbit Order
(``include/reorder/rabbit_order.hpp:267-753``) for exactly this purpose.
On TPU the ordering is load-bearing: the multihot-MXU and BSR backends'
cost scales with how tile-local each hyperedge's members are
(``planner.TiledStage.fragmentation``), and the halo distributed
design's cross-shard traffic scales with the partition cut
(``experiments/weak_scaling.py``).

Algorithm: synchronous hypergraph label propagation (fresh
implementation, not a port) —

    label(v) ← v
    repeat iters: label(e) = mode of member labels (tie → smallest);
                  label(v) = mode of incident-edge labels (tie → smallest)
    order = vertices stably sorted by final label

Runs in C++ (``csrc/hypergef_native.cpp::hg_community_order``) when the
native lib is built, with a bit-identical vectorized NumPy twin here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _segment_mode(labels_per_entry: np.ndarray, seg_ids: np.ndarray,
                  num_segments: int, default: np.ndarray) -> np.ndarray:
    """Per-segment mode with (max count, then smallest label) tie rule.

    ``seg_ids`` must be sorted.  Empty segments keep ``default``.
    Vectorized: sort entries by (seg, label), run-length encode, pick
    per segment the run with max count (first run wins ties because runs
    are label-sorted).
    """
    if labels_per_entry.size == 0:
        return default.copy()
    order = np.lexsort((labels_per_entry, seg_ids))
    s = seg_ids[order]
    l = labels_per_entry[order]
    new_run = np.ones(len(s), dtype=bool)
    new_run[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
    run_start = np.nonzero(new_run)[0]
    run_seg = s[run_start]
    run_lab = l[run_start]
    run_len = np.diff(np.append(run_start, len(s)))
    # pick per segment: maximize count; ties → smallest label = earliest
    # run (runs are sorted by label within a segment) → use a stable
    # argmax via lexsort on (-len) within segment order
    best = np.full(num_segments, -1, dtype=np.int64)
    best_len = np.zeros(num_segments, dtype=np.int64)
    # iterate runs in order; strictly-greater keeps the earliest max run
    np.maximum.at(best_len, run_seg, run_len)
    is_best = run_len == best_len[run_seg]
    # first run per segment achieving best_len
    first_best = np.full(num_segments, len(s) + 1, dtype=np.int64)
    np.minimum.at(first_best, run_seg[is_best],
                  np.nonzero(is_best)[0])
    mode = default.copy()
    has = first_best <= len(s)
    mode[has] = run_lab[first_best[has]]
    return mode


def community_order_numpy(hg, iters: int = 8) -> np.ndarray:
    """NumPy twin of ``hg_community_order`` (bit-identical)."""
    n, e = hg.num_nodes, hg.num_edges
    vlab = np.arange(n, dtype=np.int32)
    elab_default = np.arange(e, dtype=np.int32)
    ht_vertex = np.asarray(hg.ht_indices, dtype=np.int64)
    ht_seg = np.repeat(np.arange(e, dtype=np.int64), np.diff(hg.ht_indptr))
    h_edge = np.asarray(hg.h_indices, dtype=np.int64)
    h_seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(hg.h_indptr))
    for _ in range(iters):
        elab = _segment_mode(vlab[ht_vertex], ht_seg, e, elab_default)
        vlab = _segment_mode(elab[h_edge], h_seg, n, vlab)
    return np.argsort(vlab, kind="stable").astype(np.int32)


def community_order(hg, iters: int = 8) -> np.ndarray:
    """Vertex order (``order[i]`` = old id at new position i), C++ when
    available, NumPy twin otherwise."""
    from hypergef_tpu.sparse import native

    lib = native.community_order_native(hg, iters)
    if lib is not None:
        return lib
    return community_order_numpy(hg, iters)


def apply_vertex_order(hg, order: np.ndarray, sort_edges: bool = True):
    """Renumber vertices by ``order`` (and optionally sort hyperedges by
    mean new member id so contiguous edge ranges align with communities).
    Returns ``(new_hypergraph, rank)`` with ``rank[old_id] = new_id``."""
    from hypergef_tpu.sparse.hypergraph import Hypergraph

    n, e = hg.num_nodes, hg.num_edges
    rank = np.empty(n, dtype=np.int64)
    rank[np.asarray(order, dtype=np.int64)] = np.arange(n)
    new_vertex = rank[np.asarray(hg.ht_indices, dtype=np.int64)]
    seg = np.repeat(np.arange(e, dtype=np.int64), np.diff(hg.ht_indptr))
    if sort_edges and len(new_vertex):
        sums = np.zeros(e)
        cnts = np.zeros(e)
        np.add.at(sums, seg, new_vertex)
        np.add.at(cnts, seg, 1.0)
        key = np.where(cnts > 0, sums / np.maximum(cnts, 1.0), 0.0)
        eorder = np.argsort(key, kind="stable")
        erank = np.empty(e, dtype=np.int64)
        erank[eorder] = np.arange(e)
        seg = erank[seg]
    hg2 = Hypergraph.from_coo(
        new_vertex, seg, num_nodes=n, num_edges=e,
        name=f"{getattr(hg, 'name', 'graph')}-reordered",
    )
    return hg2, rank


def community_reorder(hg, iters: int = 8, sort_edges: bool = True):
    """One-call locality pass: ``(reordered_hg, vertex_rank)``."""
    return apply_vertex_order(hg, community_order(hg, iters), sort_edges)
