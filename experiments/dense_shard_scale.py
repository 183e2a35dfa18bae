"""Measured anchor for the edge-sharded int8 dense-stream path
(parallel/dense_shard.py) on unstructured graphs.

Multi-chip hardware is not available (one tunneled v5e chip), so —
exactly like ``scale_projection.py`` for the halo path — this measures
the per-device compute honestly and models only the collective:

  * MEASURE: one device's local two-stage over its int8 slice
    ``H_d [N, e_pad]`` (the compute that runs D-way parallel), for the
    D ∈ {2, 8} slices of a shuffled (structure-free) SBM-60k.
  * MODEL: the closing ``psum`` of the [N, F] f32 partial as a ring
    all-reduce at the recorded per-link ICI rate (same 45 GB/s
    parameter as weak_scaling_r2.csv).
  * COMPARE: measured single-chip tree on the same graph (the best
    single-chip sparse backend for unordered input).

Writes experiments/results/dense_shard_r2.csv.

Run: PYTHONPATH=/root/repo python experiments/dense_shard_scale.py
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

from clustered_bench import community_hypergraph
from hypergef_tpu.ops import fused
from hypergef_tpu.parallel.dense_shard import plan_sharded_dense, _two_stage_local
from hypergef_tpu.sparse.planner import plan_aggregation
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter

ICI_LINK_GBS = 45.0  # per-link rate recorded in weak_scaling_r2.csv
F = 32


def ring_allreduce_us(nbytes, d):
    return 2.0 * (d - 1) / d * nbytes / (ICI_LINK_GBS * 1e9) * 1e6


def main():
    out_path = os.path.join(os.path.dirname(__file__), "results",
                            "dense_shard_r2.csv")
    # shuffled SBM-60k = structure-free twin of the clustered shootout
    hg = community_hypergraph(60_000, 30_000, 240, 12, 0.02, 0)
    rng = np.random.default_rng(7)
    perm = rng.permutation(hg.num_nodes)
    from hypergef_tpu.sparse.reorder import apply_vertex_order

    hg, _ = apply_vertex_order(hg, perm, sort_edges=False)
    n = hg.num_nodes
    print(f"graph: |V|={n} |E|={hg.num_edges} nnz={hg.nnz} "
          f"dense {n*hg.num_edges/1e9:.2f} GB int8", flush=True)

    x0 = jnp.asarray(np.random.default_rng(0)
                     .normal(size=(n, F)).astype(np.float32))
    rows = []

    # single-chip reference: the auto gather ladder (tree at this nnz)
    plan = plan_aggregation(hg, with_aligned=False)
    hgd = hg.device_data()

    def tree_step(a):
        return fused.hgnn_aggregate(hgd, a, None, "sum", plan=plan,
                                    backend="tree")

    r = device_time_per_iter(tree_step, x0, iters=10)
    tree_us = r["per_iter_s"] * 1e6
    print(f"single-chip tree: {tree_us:.0f} us", flush=True)
    rows.append(f"single_chip,tree,1,{tree_us:.1f},0.0,{tree_us:.1f}")

    for d in (2, 8):
        dsplan = plan_sharded_dense(hg, d)
        h_slice = jnp.asarray(dsplan.h[0])  # [N, e_pad(/2)] int8 (carrier)
        scale = jnp.asarray(dsplan.degE[0])

        def slice_step(a, h_, s_):
            y = _two_stage_local(h_, a, s_, dsplan.packed)
            return chain_fold(y, a)

        r = device_time_per_iter(slice_step, x0, iters=15,
                                 operands=(h_slice, scale))
        if r.get("noisy"):
            r = device_time_per_iter(slice_step, x0, iters=60,
                                     operands=(h_slice, scale))
        comp_us = r["per_iter_s"] * 1e6
        psum_us = ring_allreduce_us(n * F * 4, d)
        total = comp_us + psum_us
        mb = dsplan.table_bytes_per_device() / 1e6
        print(f"D={d}: slice {mb:.0f} MB/device, measured compute "
              f"{comp_us:.0f} us, modeled psum {psum_us:.0f} us -> "
              f"{total:.0f} us/layer ({tree_us/total:.1f}x single-chip tree)",
              flush=True)
        rows.append(
            f"dense_shard,dense_{'i4' if dsplan.packed else 'i8'},{d},"
            f"{comp_us:.1f},{psum_us:.1f},{total:.1f}"
        )

    with open(out_path, "w") as f:
        f.write("config,backend,devices,measured_compute_us,"
                "modeled_psum_us,total_us\n")
        f.write("\n".join(rows) + "\n")
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
