"""On-chip A/B: XLA kernel-chain aligned apply vs the fused Pallas band
kernel (round-5 mandate #3), interleaved in one process.

Workloads: pubmed-shaped + ModelNet40-shaped (the mid-size FLOOR rows
that sat at 59-73%), SBM-60k (the bench clustered leg at ~98% — guard
against regression), yelp-shaped (46%; the Pallas form additionally
removes the ~200 MB materialized window round-trip per stage).

For each workload, both forms run the SAME cost-merged plan; timing is
the chained fused HGNN layer (device-honest, min-window rule), three
alternating rounds.

Run on TPU:
    python -u scripts/probe_aligned_pallas_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

from hypergef_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def build(cname):
    from fig7_9_realistic import SHAPES, clustered_at_dims
    from hypergef_tpu.sparse.planner import plan_aggregation
    from hypergef_tpu.sparse.reorder import (
        apply_vertex_order, community_reorder)

    if cname == "SBM-60k":
        from clustered_bench import community_hypergraph

        hg = community_hypergraph(60000, 36000, 240, 6.0, 0.02, 0)
        hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes),
                                   sort_edges=True)
    else:
        n, e, avg = SHAPES[cname]
        hg = clustered_at_dims(cname, n, e, avg, noise=0.02)
        perm = np.random.default_rng(7).permutation(hg.num_nodes)
        hg, _ = apply_vertex_order(hg, perm, sort_edges=False)
        hg, _ = community_reorder(hg, method="coarsen")
    plan = plan_aggregation(hg)
    return hg, plan


def measure(step, x0, operands, iters):
    from hypergef_tpu.utils.timing import device_time_per_iter

    t = device_time_per_iter(step, x0, iters=iters, operands=operands,
                             dynamic_iters=True)
    cur = iters
    while cur < 500_000 and (
        t["noisy"] or t["per_iter_s"] * cur < 2.0 * t["dispatch_s"]
    ):
        cur *= 5
        t = device_time_per_iter(step, x0, iters=cur, operands=operands,
                                 dynamic_iters=True)
    return t["per_iter_s"]


def main():
    import jax.numpy as jnp

    from hypergef_tpu.ops import fused
    from hypergef_tpu.utils.timing import chain_fold

    feat = 32
    iters = 30
    configs = ["pubmed", "ModelNet40", "SBM-60k", "yelp"]
    if len(sys.argv) > 1:
        configs = sys.argv[1].split(",")
    for cname in configs:
        t0 = time.time()
        hg, plan = build(cname)
        print(f"{cname}: nnz={hg.nnz} auto={plan.preferred_backend} "
              f"build {time.time()-t0:.0f}s", flush=True)
        if plan.aligned is None:
            print(f"{cname}: no aligned plan — skipped", flush=True)
            continue
        hgd = hg.device_data()
        sub = plan.aligned.as_device()
        x0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(hg.num_nodes, feat)).astype(np.float32))

        # distinct function identities → distinct jit caches; the env
        # flag is read at trace time inside _apply_aligned_b
        def step_xla(a, hgd_, pd):
            y = fused.hgnn_aggregate(hgd_, a, None, "sum", plan=pd,
                                     backend="aligned")
            return chain_fold(y, a)

        def step_pallas(a, hgd_, pd):
            y = fused.hgnn_aggregate(hgd_, a, None, "sum", plan=pd,
                                     backend="aligned")
            return chain_fold(y, a)

        results = {"xla": [], "pallas": []}
        # parity first (pallas on-chip lowering check)
        os.environ["HYPERGEF_ALIGNED_PALLAS"] = "1"
        yp = np.asarray(fused.hgnn_aggregate(hgd, x0, None, "sum",
                                             plan=plan, backend="aligned"))
        os.environ["HYPERGEF_ALIGNED_PALLAS"] = "0"
        yx = np.asarray(fused.hgnn_aggregate(hgd, x0, None, "sum",
                                             plan=plan, backend="aligned"))
        err = np.max(np.abs(yp - yx)) / max(np.max(np.abs(yx)), 1e-9)
        print(f"{cname}: pallas-vs-xla on-chip rel err {err:.2e}", flush=True)
        for rnd in range(3):
            for form, step in (("xla", step_xla), ("pallas", step_pallas)):
                os.environ["HYPERGEF_ALIGNED_PALLAS"] = (
                    "1" if form == "pallas" else "0")
                try:
                    t = measure(step, x0, (hgd, sub), iters)
                except Exception as ex:  # noqa: BLE001 — record and move on
                    print(f"{cname} {form} rnd{rnd}: FAILED "
                          f"{type(ex).__name__}: "
                          f"{str(ex).splitlines()[0][:140]}", flush=True)
                    t = float("nan")
                results[form].append(t)
                print(f"{cname} {form} rnd{rnd}: {t*1e6:.2f} us", flush=True)
        bx = np.nanmin(results["xla"]) * 1e6
        bp = np.nanmin(results["pallas"]) * 1e6
        print(f"{cname} BEST: xla {bx:.2f} us, pallas {bp:.2f} us "
              f"({bx/bp:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
