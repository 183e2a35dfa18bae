"""Weak-scaling study: edge-partitioned aggregation, nnz ∝ #shards.

BASELINE config #5 harness.  On real multi-chip hardware this measures
ICI weak-scaling; on the simulated CPU mesh (default here — this
environment has one physical TPU chip) it validates program structure
and reports the same efficiency metric:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python experiments/weak_scaling.py --shards 1,2,4,8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hypergef_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", default="1,2,4,8")
    ap.add_argument("--nnz-per-shard", type=int, default=200_000)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", default="halo", choices=["halo", "psum"])
    ap.add_argument("--out", default="weak_scaling.csv")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypergef_tpu.data.synthetic import random_hypergraph
    from hypergef_tpu.parallel import make_mesh, plan_sharded_aggregation
    from hypergef_tpu.parallel.dist_aggr import sharded_hgnn_aggregate

    from hypergef_tpu.utils.timing import sync

    base_t = None
    rows = []
    for d in map(int, args.shards.split(",")):
        avg = 10.0
        n_edges = args.nnz_per_shard * d // int(avg)
        n_nodes = n_edges * 2
        hg = random_hypergraph(n_nodes, n_edges, avg_edge_size=avg, seed=0,
                               name=f"ws{d}")
        mesh = make_mesh(d, 1, devices=jax.devices()[:d])
        x = np.random.default_rng(0).normal(size=(n_nodes, args.feat)).astype(np.float32)
        if args.mode == "halo":
            from hypergef_tpu.parallel.halo import plan_halo
            from hypergef_tpu.parallel.halo_aggr import (
                halo_hgnn_aggregate,
                shard_vertex_features,
            )

            plan = plan_halo(hg, d)
            xs = jnp.asarray(shard_vertex_features(plan, x))
            f = jax.jit(lambda xv: halo_hgnn_aggregate(plan, mesh, xv, None, "sum"))
            comm = plan.comm_fraction()
        else:
            plan = plan_sharded_aggregation(hg, d)
            xs = jnp.asarray(x)
            degV = jnp.asarray(hg.degV)
            f = jax.jit(
                lambda xv: sharded_hgnn_aggregate(plan, mesh, xv, None, "sum", degV=degV)
            )
            comm = 1.0  # full-replication psum
        sync(f(xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(xs)
        sync(out)
        t = (time.perf_counter() - t0) / args.iters
        if base_t is None:
            base_t = t
        eff = base_t / t  # weak scaling: ideal = 1.0 (same time, d× work)
        row = (f"mode={args.mode},shards={d},nnz={hg.nnz},{t*1e3:.3f}ms,"
               f"weak_eff={eff:.3f},comm_frac={comm:.3f}")
        rows.append(row)
        print(row, flush=True)
    with open(args.out, "a") as fo:
        fo.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
