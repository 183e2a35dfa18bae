"""On-chip A/B: spill-bucket merge aggressiveness (round-5 walmart
regression).  fig7_9_r5 showed walmart 756→1005 µs after the zero-cost
pad model collapsed its spills to one bucket (21k unique rows padded to
~74k slots), contradicting probe_spill_pad's pads-are-free finding at
that padding ratio.  This probe measures the SAME graph under three
spill-merge pad charges, interleaved:

* free  — pads cost 0 (the first r5 model: maximal merging);
* half  — pads at 4 ns (the corrected default);
* none  — merging disabled (r4-style width classes).

Run on TPU: python -u scripts/probe_spill_merge_ab.py [configs]
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


def main():
    import jax.numpy as jnp

    from fig7_9_realistic import SHAPES, clustered_at_dims
    from hypergef_tpu.ops import fused
    from hypergef_tpu.sparse import planner
    from hypergef_tpu.sparse.reorder import (
        apply_vertex_order, community_reorder)
    from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter

    configs = (sys.argv[1].split(",") if len(sys.argv) > 1
               else ["walmart-trips-100", "pubmed"])
    variants = {"free": 0.0, "half": 4e-9, "none": 1.0}  # 1 s/slot = never merge

    def measure(step, x0, operands, iters=30):
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

    for cname in configs:
        n, e, avg = SHAPES[cname]
        hg = clustered_at_dims(cname, n, e, avg, noise=0.02)
        perm = np.random.default_rng(7).permutation(hg.num_nodes)
        hg, _ = apply_vertex_order(hg, perm, sort_edges=False)
        hg, _ = community_reorder(hg, method="coarsen")
        hgd = hg.device_data()
        x0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(hg.num_nodes, 32)).astype(np.float32))
        plans = {}
        for vname, pad_s in variants.items():
            planner.ALIGNED_SPILL_PAD_GATHER_S = pad_s
            t0 = time.time()
            plans[vname] = planner.plan_aligned(hg)
            al = plans[vname]
            nsp = sum(len(st.spills)
                      for st in (al.edge_stage, al.vertex_stage))
            slots = sum(s.spill_src.size
                        for st in (al.edge_stage, al.vertex_stage)
                        for s in st.spills)
            print(f"{cname} {vname}: plan {time.time()-t0:.1f}s "
                  f"spill_buckets={nsp} padded_slots={slots}", flush=True)
        planner.ALIGNED_SPILL_PAD_GATHER_S = 4e-9  # restore default

        steps = {}
        for vname in variants:
            def step(a, hgd_, pd, _v=vname):  # distinct fn identity per plan
                y = fused.hgnn_aggregate(hgd_, a, None, "sum", plan=pd,
                                         backend="aligned")
                return chain_fold(y, a)

            steps[vname] = step
        results = {v: [] for v in variants}
        for rnd in range(3):
            for vname in variants:
                t = measure(steps[vname], x0,
                            (hgd, plans[vname].as_device()))
                results[vname].append(t)
                print(f"{cname} {vname} rnd{rnd}: {t*1e6:.2f} us",
                      flush=True)
        best = {v: min(r) * 1e6 for v, r in results.items()}
        print(f"{cname} BEST: " + ", ".join(
            f"{v} {b:.2f} us" for v, b in best.items()), flush=True)


if __name__ == "__main__":
    main()
