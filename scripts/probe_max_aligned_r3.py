"""Round-3 mandate #6 measurement: aligned-form max via the masked
argmax Pallas kernel (ops/aligned_max) vs round-2's argmax gather tree,
and the resulting max/sum ratio on aligned-preferred workloads.

Round-2 state: aligned max/sum ~= 5x (the argmax V->E was gather-bound;
the XLA windowed masked-max probe was a ~9% near-tie because XLA
materializes the [G, W, F] select through HBM).  The Pallas kernel keeps
band plane + window rows VMEM-resident across all F passes.

Interleaved A/B, honest fencing.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

from hypergef_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clustered_bench import community_hypergraph  # noqa: E402
from hypergef_tpu.ops import fused, maxops  # noqa: E402
from hypergef_tpu.ops.aligned_max import v2e_max_aligned  # noqa: E402
from hypergef_tpu.sparse import planner  # noqa: E402
from hypergef_tpu.sparse.reorder import apply_vertex_order  # noqa: E402
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter  # noqa: E402


def main(feat=32, iters=40, rounds=3):
    print("devices:", jax.devices(), flush=True)
    workloads = [
        ("sbm60k", community_hypergraph(60_000, 30_000, 240, 12, 0.02, 0)),
        ("pubmed_clustered",
         community_hypergraph(19717, 19717, 80, 4.3, 0.01, 0)),
    ]
    for name, hg in workloads:
        hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes),
                                   sort_edges=True)
        plan = planner.plan_aggregation(hg, dense_threshold=0,
                                        with_precomp=False)
        assert plan.preferred_backend == "aligned", plan.preferred_backend
        hgd = hg.device_data()
        fe, fv = plan.aligned.device()
        te, tv = plan.tree.device()
        x0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(hg.num_nodes, feat)).astype(np.float32))

        def f_sum(a):
            y = fused.hgnn_aggregate(hgd, a, None, "sum", plan=plan,
                                     backend="aligned")
            return chain_fold(y, a)

        def f_max_new(a):
            y = fused.hgnn_aggregate(hgd, a, None, "max", plan=plan,
                                     backend="aligned")
            return chain_fold(y, a)

        def f_v2e_aligned(a):
            y = v2e_max_aligned(a, fe, hgd.h_edge, hgd.h_segids,
                                hgd.h_indptr)
            return chain_fold(y, a)

        def f_v2e_tree(a):
            y = maxops.v2e_max_tree(a, te, hgd.h_edge, hgd.h_segids,
                                    hgd.h_indptr)
            return chain_fold(y, a)

        # correctness on-chip first
        om = fused.hgnn_aggregate(hgd, x0, None, "max", plan=plan,
                                  backend="aligned")
        ot = fused.hgnn_aggregate(hgd, x0, None, "max", plan=plan,
                                  backend="tree")
        rel = float(jnp.abs(om - ot).max() / jnp.abs(ot).max())
        print(f"{name}: aligned-max vs tree-max rel diff {rel:.2e}",
              flush=True)

        legs = [("sum_aligned", f_sum), ("max_aligned_full", f_max_new),
                ("v2e_max_pallas", f_v2e_aligned),
                ("v2e_max_tree", f_v2e_tree)]
        res = {}
        for rnd in range(rounds):
            for lname, fn in legs:
                r = device_time_per_iter(fn, x0, iters=iters)
                res.setdefault(lname, []).append(r["per_iter_s"] * 1e6)
                print(f"  round {rnd} {name}/{lname}: "
                      f"{r['per_iter_s']*1e6:.1f} us"
                      f"{' NOISY' if r.get('noisy') else ''}", flush=True)
        s = np.median(res["sum_aligned"])
        m = np.median(res["max_aligned_full"])
        print(f"{name}: max/sum = {m/s:.2f}x (sum {s:.0f} us, "
              f"max {m:.0f} us; v2e pallas "
              f"{np.median(res['v2e_max_pallas']):.0f} vs tree "
              f"{np.median(res['v2e_max_tree']):.0f} us)", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
