"""Probe: spill_fudge re-sweep WITH (group, src) spill dedup.

Breakdown probe (2026-08-17) showed the spill path costs ~230 of 297 us
on SBM-60k — per-row-gather-bound at ~8 ns/row, i.e. ~6400 cost-units
at the model's byte scale, vs the 448 units spill_cost currently
charges.  An earlier fudge=1024 retune measured WORSE pre-dedup; re-test
the tradeoff now that duplicate hub gathers are deduped.

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_spill_fudge.py > /tmp/probe_fudge.log 2>&1 &
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
    n, e, comm, avg, noise, f, iters = 60_000, 30_000, 240, 12, 0.02, 32, 20
    hg = community_hypergraph(n, e, comm, avg, noise, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    degE = jnp.asarray(hg.degE)
    degV = jnp.asarray(hg.degV)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    for fudge in (256, 1536, 6144, 24576):
        try:
            plan = planner.plan_aligned(hg, spill_fudge=fudge)
            es, vs = plan.as_device().stages
            sfr = (plan.edge_stage.spill_fraction,
                   plan.vertex_stage.spill_fraction)
            mb = (plan.edge_stage.table_bytes()
                  + plan.vertex_stage.table_bytes()) / 1e6
            pad_rows = sum(
                s.spill_src.size
                for st in (plan.edge_stage, plan.vertex_stage)
                for s in st.spills
            )

            def step(xv, es_, vs_):
                xe = tree_ops._apply_aligned_b(xv, es_) * degE
                y = tree_ops._apply_aligned_b(xe, vs_) * degV
                return chain_fold(y, xv)

            t = device_time_per_iter(step, x0, iters=iters, operands=(es, vs))
            print(f"fudge={fudge:5d}: {t['per_iter_s']*1e6:7.1f} us  "
                  f"(spill {sfr[0]:.3f}/{sfr[1]:.3f}, pad_rows {pad_rows}, "
                  f"tables {mb:.1f} MB, compile {t['compile_s']:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"fudge={fudge}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
