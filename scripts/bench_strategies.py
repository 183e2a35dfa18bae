"""Microbenchmark of fused-aggregation strategies on the real TPU chip.

Compares backend designs for the two-stage incidence aggregation (the
fig7/fig9 analogue, on synthetic graphs shaped like the reference
datasets) to select the production kernel strategy.  Run on TPU:

    PYTHONPATH="/root/repo:$PYTHONPATH" python -u scripts/bench_strategies.py
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hypergef_tpu.data.synthetic import random_hypergraph
from hypergef_tpu.ops import fused
from hypergef_tpu.sparse.planner import plan_aggregation, plan_tiles
from hypergef_tpu.utils.timing import device_time_per_iter


def dense_hgnn(h_dense, degE, degV, x):
    xe = h_dense.T @ x
    xe = xe * degE
    xv = h_dense @ xe
    return xv * degV


def dense_hgnn_bf16(h_dense, degE, degV, x):
    xe = jnp.dot(h_dense.T, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    xe = xe * degE
    xv = jnp.dot(h_dense.astype(jnp.bfloat16), xe.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    return xv * degV


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="cora,pubmed,big")
    ap.add_argument("--backends", default="cumsum,ell,dense,dense_bf16,xla")
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--grad", action="store_true", help="also time fwd+bwd")
    args = ap.parse_args()

    shapes = {
        "cora": dict(n=2708, e=2708, avg=4.0),
        "pubmed": dict(n=19717, e=19717, avg=4.3),
        "big": dict(n=100_000, e=50_000, avg=10.0),
        "huge": dict(n=500_000, e=250_000, avg=12.0),
    }
    print("devices:", jax.devices(), flush=True)
    results = []
    for cname in args.configs.split(","):
        s = shapes[cname]
        hg = random_hypergraph(s["n"], s["e"], avg_edge_size=s["avg"], seed=0,
                               name=cname)
        hgd = hg.device_data()
        plan = plan_aggregation(hg, with_tile=True)
        print(f"   tree depth={plan.tree.depth()}", flush=True)
        x0 = jnp.asarray(
            np.random.default_rng(0).normal(size=(s["n"], args.feat)).astype(np.float32)
        )
        print(f"== {cname}: {hg}", flush=True)
        # bound set by the remote-compile payload limit: closure-captured
        # dense H ships inside the program body
        dense_ok = s["n"] * s["e"] * 4 < 2e8
        h_dense = None
        if dense_ok:
            h_dense = jnp.asarray(hg.to_scipy().toarray())
        for backend in args.backends.split(","):
            if backend.startswith("dense"):
                if not dense_ok:
                    continue
                fn = (dense_hgnn_bf16 if backend == "dense_bf16" else dense_hgnn)
                step = lambda a: fn(h_dense, hgd.degE, hgd.degV, a)
            else:
                if backend == "xla" and cname in ("big", "huge"):
                    continue  # scatter compile takes tens of minutes
                step = lambda a: fused.hgnn_aggregate(
                    hgd, a, None, "sum", plan=plan, backend=backend
                )
            try:
                t0 = time.time()
                r = device_time_per_iter(step, x0, iters=args.iters)
                row = dict(config=cname, backend=backend, mode="fwd",
                           us_per_iter=r["per_iter_s"] * 1e6,
                           compile_s=round(r["compile_s"], 1),
                           nnz=hg.nnz)
                results.append(row)
                print("  ", json.dumps(row), flush=True)
                if args.grad:
                    g = lambda a: jax.grad(
                        lambda xv: jnp.sum(step(xv) ** 2)
                    )(a)
                    r = device_time_per_iter(g, x0, iters=args.iters)
                    row = dict(config=cname, backend=backend, mode="fwd+bwd",
                               us_per_iter=r["per_iter_s"] * 1e6,
                               compile_s=round(r["compile_s"], 1), nnz=hg.nnz)
                    results.append(row)
                    print("  ", json.dumps(row), flush=True)
            except Exception as ex:
                print(f"   {backend}: FAILED {type(ex).__name__}: {ex}",
                      file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
