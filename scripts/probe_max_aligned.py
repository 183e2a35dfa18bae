"""Probe: max first-aggregation on the ALIGNED backend (community-sorted
graphs) — old path (plain-tree E->V) vs new path (aligned band-matmul
E->V) vs aligned sum.

max V->E is the argmax-carrying tree either way (the exact-VJP
record_table analogue of hgnnaggr_cuda.cu:144-208); the E->V stage is a
plain sum, so it can ride the aligned banded matmuls.  Interleaved A/B
in one process (tunnel drift is +-30% across runs).

RESULT (TPU v5e, 2026-08-18, SBM-60k nnz=352k f=32, 3 rounds):
    sum-aligned 330-357 us | max-aligned(new) 1666-1973 us |
    max-tree(old) 3241-3605 us
-> the aligned E->V halves max cost (1.9x); the residual is the argmax
V->E gather tree (see scripts/probe_max_window.py for the recorded
near-tie of the gather-free windowed alternative).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/experiments")
from clustered_bench import community_hypergraph

from hypergef_tpu.ops import fused
from hypergef_tpu.sparse.planner import plan_aggregation
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import device_time_per_iter

F = 32
hg = community_hypergraph(60_000, 30_000, 240, 12, 0.02, 0)
hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
plan = plan_aggregation(hg)
print(f"graph: N={hg.num_nodes} E={hg.num_edges} nnz={hg.nnz} "
      f"preferred={plan.preferred_backend}", flush=True)
assert plan.preferred_backend == "aligned"
hgd = hg.device_data()
x0 = jnp.asarray(
    np.random.default_rng(0).normal(size=(hg.num_nodes, F)).astype(np.float32))

VARIANTS = {
    "sum-aligned": ("sum", "aligned"),
    "max-aligned(new)": ("max", "aligned"),
    "max-tree(old)": ("max", "tree"),
}

for rnd in range(3):
    line = [f"round {rnd}:"]
    for tag, (aggr, b) in VARIANTS.items():
        def f(x, _a=aggr, _b=b):
            return fused.hgnn_aggregate(hgd, x, None, _a, plan=plan, backend=_b)
        r = device_time_per_iter(f, x0, iters=40)
        noisy = " (noisy)" if r["noisy"] else ""
        line.append(f"{tag} {r['per_iter_s']*1e6:8.1f}us{noisy}")
    print("  ".join(line), flush=True)
