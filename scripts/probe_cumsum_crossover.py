"""Probe: cumsum-vs-tree crossover on UNIFORM-RANDOM graphs after the
MXU block-scan swap (ops/segments._prefix_sum).

probe_random_floor.py showed the swapped cumsum backend beats tree at
pubmed scale (85k nnz: 712 us vs 940 us).  The auto ladder still
prefers "tree" for uniform-random graphs beyond the dense regime, and
the _CUMSUM_NNZ_GUARD reroutes cumsum->tree above 1M nnz.  Measure the
fused layer (sum aggr, f=32) at several scales to decide whether the
ladder should prefer cumsum in this regime and where the true perf
crossover (if any) sits.
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
    # (N=E, avg_edge_size) -> nnz ~ N*k
    (19_717, 4.3),    # pubmed shape, ~85k nnz
    (60_000, 8.0),    # ~480k nnz (the bench "big" config scale)
    (120_000, 8.0),   # ~1M nnz (at the guard boundary)
]

for n, k in CASES:
    hg = random_hypergraph(n, n, avg_edge_size=k, seed=0, name=f"rand-{n}")
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    nnz = hg.nnz
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    rows = {}
    for backend in ("cumsum", "tree"):
        def f(x, _b=backend):
            return fused.hgnn_aggregate(hgd, x, None, "sum", plan=plan,
                                        backend=_b)
        r = device_time_per_iter(f, x0, iters=40)
        rows[backend] = r["per_iter_s"] * 1e6
        if r["noisy"]:
            print(f"  (noisy: {backend} nnz={nnz})", flush=True)
    ratio = rows["tree"] / rows["cumsum"]
    print(
        f"nnz={nnz:>9,}  cumsum={rows['cumsum']:8.1f} us  "
        f"tree={rows['tree']:8.1f} us  tree/cumsum={ratio:.2f}x",
        flush=True,
    )
