"""Probe: max first-aggregation cost vs sum, per backend (VERDICT r1
item 2 done-criterion: "max within ~2x of sum on every backend").

max = argmax-carrying tree V->E (ops/maxops) + the backend's E->V sum
stage; matmul-form (aligned/multihot) stages route max to the oracle,
so the comparison is meaningful on dense / cumsum / tree.
Interleaved A/B in one process (tunnel drift is +-30% across runs).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from hypergef_tpu.data.synthetic import random_hypergraph
from hypergef_tpu.ops import fused
from hypergef_tpu.sparse.planner import plan_aggregation
from hypergef_tpu.utils.timing import device_time_per_iter

F = 32
CASES = [
    ("cora-shape", 2708, 2708, 4.0, ("dense", "tree", "cumsum")),
    ("pubmed-shape", 19717, 19717, 4.3, ("cumsum", "tree")),
]

for name, n, e, k, backends in CASES:
    hg = random_hypergraph(n, e, avg_edge_size=k, seed=0, name=name)
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, F)).astype(np.float32))
    for b in backends:
        ts = {}
        for aggr in ("sum", "max"):
            def f(x, _a=aggr, _b=b):
                return fused.hgnn_aggregate(hgd, x, None, _a, plan=plan,
                                            backend=_b)
            r = device_time_per_iter(f, x0, iters=300 if n <= 3000 else 60)
            ts[aggr] = r["per_iter_s"] * 1e6
            tag = " (noisy)" if r["noisy"] else ""
            print(f"{name:13s} {b:7s} {aggr:4s} {ts[aggr]:8.1f} us{tag}",
                  flush=True)
        print(f"{name:13s} {b:7s} max/sum = {ts['max']/ts['sum']:.2f}x",
              flush=True)
