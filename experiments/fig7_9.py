"""fig7/fig9 analogue: fused-kernel vs baseline-formulation sweep.

Reference: ``experiment/fig7.cu``/``fig9.cu`` compare cuSPARSE two-step
SpMM vs the fused kernel per dataset.  Here the "cuSPARSE two-step"
analogue is the plain XLA segment-sum path (materialized nnz
intermediates, scatter combine) and the fused contenders are the
cumsum / tree / dense backends; measured as device time per iteration.

    python experiments/fig7_9.py --out fig7.csv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hypergef_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fig7.csv")
    ap.add_argument("--configs", default="cora,pubmed")
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--backends", default="xla,cumsum,tree,dense")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax.numpy as jnp

    from hypergef_tpu.data.synthetic import random_hypergraph
    from hypergef_tpu.ops import fused
    from hypergef_tpu.sparse.planner import plan_aggregation
    from hypergef_tpu.utils.timing import device_time_per_iter

    shapes = {
        "cora": (2708, 2708, 4.0),
        "citeseer": (3312, 3312, 3.2),
        # "pubmed" kept the square round-1 convention for cross-round
        # comparability; "pubmed_real" matches the reference dataset's
        # actual incidence box (19717 vertices x 7963 cocitation
        # hyperedges, AllSet/dataloader.py:31) at the same ~85k nnz
        "pubmed": (19717, 19717, 4.3),
        "pubmed_real": (19717, 7963, 10.8),
        "big": (100_000, 50_000, 10.0),
    }
    with open(args.out, "a") as f:
        for cname in args.configs.split(","):
            n, e, avg = shapes[cname]
            hg = random_hypergraph(n, e, avg_edge_size=avg, seed=0, name=cname)
            plan = plan_aggregation(hg)
            hgd = hg.device_data()
            x0 = jnp.asarray(
                np.random.default_rng(0)
                .normal(size=(n, args.feat))
                .astype(np.float32)
            )
            base_t = None
            for backend in args.backends.split(","):
                if backend == "dense" and plan.dense is None:
                    continue
                try:
                    r = device_time_per_iter(
                        lambda a: fused.hgnn_aggregate(
                            hgd, a, None, "sum", plan=plan, backend=backend
                        ),
                        x0,
                        iters=args.iters,
                    )
                except Exception as ex:
                    print(f"{cname}/{backend}: FAILED {ex}")
                    continue
                t = r["per_iter_s"]
                if base_t is None and t > 0:
                    base_t = t
                speedup = base_t / t if (base_t and t > 0) else float("nan")
                row = (
                    f"{cname},{backend},f={args.feat},nnz={hg.nnz},"
                    f"{t*1e6:.2f}us,speedup_vs_first={speedup:.2f}"
                )
                print(row)
                print(row, file=f, flush=True)


if __name__ == "__main__":
    main()
