"""Probe: spill-width padding policy A/B (multiple-of-8 + loose merge vs
round-2 pow2 + coarse merge) on the SBM-60k aligned stage.

Padding slots are real per-row gathers (~6-8 ns each); host-side the new
policy cuts padded slots 34.5k -> 25.0k (-27%).  Interleaved in one
process, 3 rounds (tunnel drift +-30% across runs).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from experiments.clustered_bench import community_hypergraph
from hypergef_tpu.ops import tree as tree_ops
from hypergef_tpu.sparse.planner import (
    TreePlan, build_aligned_stage_bucketed,
)
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import device_time_per_iter

F = 32
hg = community_hypergraph(60_000, 30_000, 240, 12, 0.02, 0)
hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
hgd = hg.device_data()
x0 = jnp.asarray(
    np.random.default_rng(0).normal(size=(hg.num_nodes, F)).astype(np.float32))

plans = {}
import hypergef_tpu.sparse.planner as P
_orig_merge = P._merge_small_buckets
VARIANTS = {
    "mult8": (False, None),           # new: mult-8 widths, loose merge
    "pow2": (True, None),             # round-2: pow2, coarse merge
    "m8coarse": (False, "coarse"),    # mult-8 widths, coarse merge
}
for tag, (pow2, merge) in VARIANTS.items():
    if merge == "coarse":
        P._merge_small_buckets = lambda v, m: _orig_merge(v, max(m, len(v) // 8, 8))
    else:
        P._merge_small_buckets = _orig_merge
    e = build_aligned_stage_bucketed(
        hg.ht_indptr, hg.ht_indices, hg.num_nodes, spill_pad_pow2=pow2)
    v = build_aligned_stage_bucketed(
        hg.h_indptr, hg.h_indices, hg.num_edges, spill_pad_pow2=pow2)
    P._merge_small_buckets = _orig_merge
    slots = sum(s.spill_src.size for st in (e, v) for s in st.spills)
    nb = sum(len(st.spills) for st in (e, v))
    plan = TreePlan(edge_stage=e, vertex_stage=v,
                    num_nodes=hg.num_nodes, num_edges=hg.num_edges)
    plan.device()
    plans[tag] = plan
    print(f"{tag}: spill slots={slots} buckets={nb}", flush=True)

for rnd in range(3):
    for tag, plan in plans.items():
        def f(x, _p=plan):
            return tree_ops.hgnn_aggregate_tree(hgd, x, None, "sum", _p)
        r = device_time_per_iter(f, x0, iters=60)
        tag2 = " (noisy)" if r["noisy"] else ""
        print(f"round{rnd} {tag:6s} {r['per_iter_s']*1e6:7.1f} us{tag2}",
              flush=True)
