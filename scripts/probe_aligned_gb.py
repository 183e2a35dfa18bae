"""Probe: (group_rows, block_rows) sweep of the aligned backend on the
pubmed-clustered shape (avg degree 4.3 — band tables stream ~200x the
nnz at the default G=128/B=128, so finer granularity should cut the
dominant streamed bytes).

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_aligned_gb.py > /tmp/probe_gb.log 2>&1 &
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
from scale_aligned import big_sbm

from hypergef_tpu.ops import tree as tree_ops
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter


def main():
    f, iters = 32, 60
    hg = big_sbm(19717, 19717, 80, 4.3, 0.01, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    degE = jnp.asarray(hg.degE)
    degV = jnp.asarray(hg.degV)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(hg.num_nodes, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    for gr, br in [(128, 128), (128, 64), (128, 32), (64, 64), (64, 32),
                   (256, 128)]:
        try:
            plan = planner.plan_aligned(hg, group_rows=gr, block_rows=br)
            es, vs = plan.as_device().stages
            hes, hvs = plan.edge_stage, plan.vertex_stage
            mb = (hes.table_bytes() + hvs.table_bytes()) / 1e6

            def step(xv, es_, vs_):
                xe = tree_ops._apply_aligned_b(xv, es_) * degE
                y = tree_ops._apply_aligned_b(xe, vs_) * degV
                return chain_fold(y, xv)

            t = device_time_per_iter(step, x0, iters=iters, operands=(es, vs))
            print(f"G={gr:3d} B={br:3d}: {t['per_iter_s']*1e6:7.1f} us  "
                  f"(tables {mb:.1f} MB, spill {hes.spill_fraction:.3f}/"
                  f"{hvs.spill_fraction:.3f}, widths e={hes.window_blocks} "
                  f"v={hvs.window_blocks}, compile {t['compile_s']:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"G={gr} B={br}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
