"""Probe: are aligned-spill sources hub-concentrated across groups?

KERNEL_NOTES (round-2 final): the spill floor tracks UNIQUE gathered
rows — sum over groups of each group's unique out-of-window sources
(~21.8k x ~8 ns = 174 us on SBM-60k).  If the SAME source row spills in
many groups (a hub), a shared hub block — gather the top-K spilled
sources ONCE, give every group an extra [G, K] band — would collapse
those per-group gathers into one block gather + one streamed matmul.

This probe answers, per stage, with NO device work:
  pairs     — unique (group, src) spill pairs (the current gather count)
  U         — globally unique spilled sources
  top-K cov — fraction of pairs removed if the top-K most-multiplied
              sources moved to a hub block, for K in (128..2048)
  hub cost  — streamed band bytes added by that K (n_groups*G*K int8)
              vs modeled gather savings (pairs_removed * 8 ns)

Run: PYTHONPATH=/root/repo python scripts/probe_spill_hubs.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

import numpy as np

from clustered_bench import community_hypergraph
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order

GATHER_NS = 8.0  # measured per-row spill gather (probe_aligned_breakdown)
STREAM_GBS = 700.0  # conservative v5e HBM stream


def spill_pairs(indptr, indices, num_inputs, G=128, max_width=8):
    """Replicate the bucketed planner's spill determination, return the
    unique (group, src) pairs."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    S = len(indptr) - 1
    n_groups = max(-(-S // G), 1)
    nb = max(-(-num_inputs // planner.ALIGNED_BLOCK), 1)
    seg = np.repeat(np.arange(S, dtype=np.int64), np.diff(indptr))
    grp = seg // G
    blk = indices // planner.ALIGNED_BLOCK
    cnt = np.bincount(grp, minlength=n_groups)
    off, wid = planner._group_windows_opt(
        grp, blk, cnt, nb, min(max_width, nb), G)
    wid = planner._merge_small_buckets(wid, max(8, n_groups // 32))
    off = np.minimum(off, np.maximum(nb - wid, 0))
    sp = ~((blk >= off[grp]) & (blk < off[grp] + wid[grp]))
    pair = grp[sp] * np.int64(num_inputs + 1) + indices[sp]
    uk = np.unique(pair)
    return (uk // (num_inputs + 1)), (uk % (num_inputs + 1)), n_groups


def report(tag, ugrp, usrc, n_groups, G=128):
    pairs = len(usrc)
    mult = np.sort(np.bincount(usrc.astype(np.int64)))[::-1]
    mult = mult[mult > 0]
    U = len(mult)
    print(f"\n[{tag}] groups={n_groups} spill pairs={pairs} unique srcs={U} "
          f"mean mult={pairs / max(U, 1):.2f} max mult={mult[0] if U else 0}")
    cum = np.cumsum(mult)
    for K in (128, 256, 512, 1024, 2048):
        if U == 0:
            break
        k = min(K, U)
        removed = int(cum[k - 1])
        # remaining pairs whose src is NOT in the hub set keep their gathers
        band_mb = n_groups * G * K / 1e6
        stream_us = band_mb * 1e3 / STREAM_GBS
        save_us = removed * GATHER_NS / 1e3
        print(f"  K={K:5d}: pairs removed {removed:6d} ({removed/pairs:5.1%}) "
              f"hub band {band_mb:6.2f} MB (+{stream_us:5.1f} us stream) "
              f"gather save ~{save_us:6.1f} us  net {save_us - stream_us:+7.1f} us")


def run(tag, hg):
    # production prep: identity vertex order (already community-sorted)
    # + median-key hyperedge sort — same as clustered_bench/probes
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    print(f"=== {tag}: |V|={hg.num_nodes} |E|={hg.num_edges} nnz={hg.nnz} ===")
    g, s, ng = spill_pairs(hg.ht_indptr, hg.ht_indices, hg.num_nodes)
    report("V->E (src=vertices)", g, s, ng)
    g, s, ng = spill_pairs(hg.h_indptr, hg.h_indices, hg.num_edges)
    report("E->V (src=edges)", g, s, ng)


def powerlaw_clustered(n_nodes, n_edges, n_comm, avg, noise, seed):
    """Community graph whose NOISE endpoints follow a Zipf hub law (real
    graphs' boundary crossings concentrate on hub vertices)."""
    rng = np.random.default_rng(seed)
    comm_of = np.sort(rng.integers(0, n_comm, size=n_nodes))
    starts = np.searchsorted(comm_of, np.arange(n_comm))
    ends = np.searchsorted(comm_of, np.arange(n_comm), side="right")
    # zipf ranks over vertices for noise endpoints
    ranks = rng.permutation(n_nodes)
    zipf_p = 1.0 / (np.argsort(ranks) + 1.0)
    zipf_p /= zipf_p.sum()
    vs, es = [], []
    for e in range(n_edges):
        c = rng.integers(0, n_comm)
        lo, hi = starts[c], ends[c]
        if hi - lo < 2:
            lo, hi = 0, n_nodes
        k = max(int(rng.poisson(avg)), 2)
        members = rng.integers(lo, hi, size=k)
        flip = rng.random(k) < noise
        members[flip] = rng.choice(n_nodes, size=int(flip.sum()), p=zipf_p)
        members = np.unique(members)
        vs.append(members)
        es.append(np.full(len(members), e, dtype=np.int64))
    from hypergef_tpu.sparse.hypergraph import Hypergraph
    return Hypergraph.from_coo(
        np.concatenate(vs), np.concatenate(es),
        num_nodes=n_nodes, num_edges=n_edges, name="plc")


if __name__ == "__main__":
    run("SBM-60k (uniform noise)",
        community_hypergraph(60_000, 30_000, 240, 12, 0.02, 0))
    run("SBM-60k (zipf-hub noise)",
        powerlaw_clustered(60_000, 30_000, 240, 12, 0.02, 0))
    run("pubmed-shape clustered",
        community_hypergraph(19_717, 7_963, 80, 11, 0.02, 1))
