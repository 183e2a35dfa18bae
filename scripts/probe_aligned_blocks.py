"""Probe: aligned-backend block_rows sweep (gather-width lever).

Bisect (quadratic folds) showed the window block-gather running at only
~73 GB/s — per-gather-row overhead on 8 KB rows (128 x 32 x bf16).
Larger source blocks amortize that per-row cost at the price of coarser
window quantization (more band bytes).  Sweep block_rows 128/256/512 on
SBM-60k f=32.

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_aligned_blocks.py > /tmp/probe_blocks.log 2>&1 &
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

from hypergef_tpu.ops import fused
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter


def main():
    n, e, comm, avg, noise, f, iters = 60_000, 30_000, 240, 12, 0.02, 32, 20
    hg = community_hypergraph(n, e, comm, avg, noise, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    hgd = hg.device_data()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    for br in (128, 256, 512):
        try:
            plan = planner.plan_aligned(hg, block_rows=br)
            es, vs = plan.edge_stage, plan.vertex_stage
            mb = (es.table_bytes() + vs.table_bytes()) / 1e6
            pdev = plan.as_device()

            def step(xv, hgd_, pd):
                y = fused.hgnn_aggregate(hgd_, xv, None, "sum", plan=pd,
                                         backend="aligned")
                return chain_fold(y, xv)

            t = device_time_per_iter(step, x0, iters=iters, operands=(hgd, pdev))
            print(f"block_rows={br}: {t['per_iter_s']*1e6:.1f} us  "
                  f"(tables {mb:.1f} MB, widths e={es.window_blocks} "
                  f"v={vs.window_blocks}, spill {es.spill_fraction:.3f}/"
                  f"{vs.spill_fraction:.3f}, compile {t['compile_s']:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"block_rows={br}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
