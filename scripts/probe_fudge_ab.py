"""Interleaved A/B: spill_fudge 256 vs 24576 (controls process-level
variance on the tunneled chip — the one-shot sweep was non-monotone
with ~±40 us spread).  3 alternating rounds each.

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_fudge_ab.py > /tmp/probe_fudge_ab.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

from hypergef_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
from clustered_bench import community_hypergraph

from hypergef_tpu.ops import tree as tree_ops
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter


def main():
    n, e, comm, avg, noise, f, iters = 60_000, 30_000, 240, 12, 0.02, 32, 60
    hg = community_hypergraph(n, e, comm, avg, noise, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    degE = jnp.asarray(hg.degE)
    degV = jnp.asarray(hg.degV)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    plans = {}
    for fudge in (256, 24576):
        plan = planner.plan_aligned(hg, spill_fudge=fudge)
        plans[fudge] = plan.as_device().stages

    def step(xv, es_, vs_):
        xe = tree_ops._apply_aligned_b(xv, es_) * degE
        y = tree_ops._apply_aligned_b(xe, vs_) * degV
        return chain_fold(y, xv)

    for rnd in range(3):
        for fudge, (es, vs) in plans.items():
            t = device_time_per_iter(step, x0, iters=iters, operands=(es, vs))
            print(f"round {rnd} fudge={fudge:5d}: "
                  f"{t['per_iter_s']*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
