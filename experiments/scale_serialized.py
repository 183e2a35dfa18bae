"""100M-nnz halo layer, MEASURED by serialized execution — round-4
mandate #9 (upgrade of the r3 fitted projection).

The r3 artifact projected the 100M-nnz layer from a 4-point fitted
shard curve whose linear fit carried a physically odd −4.5 ms intercept
(an artifact of fitting a line to a mildly convex ns/nnz curve: the
12.5M/18.7M shards pay proportionally more spill-gather latency than
the 3.1M one).  This driver ELIMINATES the extrapolation: it builds the
real 8-shard HaloPlan of a 100M-nnz community graph and executes all 8
shard programs back-to-back on the one chip
(``parallel/serial_halo.serialized_halo_forward``, oracle- and
shard_map-equivalence-tested), staging the two all_to_alls through the
host.  Reported:

* per-shard device compute, chained-fenced (the honest kernel number);
* the REAL exchange buffer sizes from the plan's masks — the ICI
  transfer term is the ONLY modeled quantity left (45 GB/s/link);
* total serialized wall time (staging + compute) for provenance.

Output: experiments/results/scale_serialized_r4.csv
Run on TPU (long: graph gen + plan build are tens of minutes host-side):
    nohup python -u experiments/scale_serialized.py \
        > /tmp/scale_ser.log 2>&1 &
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

from hypergef_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

from scale_aligned import big_sbm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--comm", type=int, default=40_000)
    ap.add_argument("--avg", type=float, default=10.0)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ici-gbps", type=float, default=45.0)
    ap.add_argument("--out",
                    default="experiments/results/scale_serialized_r5.csv")
    ap.add_argument("--plan-cache", default="/tmp/hypergef_plancache_scale")
    ap.add_argument("--epoch", action="store_true",
                    help="also measure ONE serialized full train step "
                    "(fwd+loss+bwd+Adam; round-5 mandate #7) and append "
                    "an epoch row")
    ap.add_argument("--skip-layer", action="store_true",
                    help="skip the layer measurement (epoch-only rerun "
                    "against the cached plan)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from hypergef_tpu.parallel.halo import plan_halo
    from hypergef_tpu.parallel.serial_halo import (
        _shard_ops, serialized_halo_forward,
    )
    from hypergef_tpu.sparse.reorder import apply_vertex_order
    from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter

    t0 = time.time()
    hg = big_sbm(args.nodes, args.edges, args.comm, args.avg, 0.01, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    gen_s = time.time() - t0
    print(f"graph: nnz={hg.nnz} gen {gen_s:.0f}s", flush=True)

    t0 = time.time()
    # raised spill cap: at 12.5M-nnz shards the uniform interior pads
    # its spill table past the default 2^28 guard (~287M entries at 5%
    # spill); this host affords the bytes.  Content-keyed cache: the
    # 100M-nnz plan build is ~17 min host-side — cache it so a re-run
    # (e.g. after an OOM fix in the executor) re-measures in minutes.
    from hypergef_tpu.sparse.plancache import cached_plan_halo

    plan = cached_plan_halo(hg, args.shards, cache_dir=args.plan_cache,
                            local_form="aligned",
                            aligned_spill_limit=1 << 30)
    plan_s = time.time() - t0
    print(f"halo plan ({plan.local_form} interior): {plan_s:.0f}s, "
          f"comm_frac={plan.comm_fraction():.4f} "
          f"halo_frac={plan.halo_comm_fraction():.4f}", flush=True)

    x = np.random.default_rng(0).normal(
        size=(hg.num_nodes, args.feat)).astype(np.float32)

    rows = [
        "# 100M-nnz halo layer r5: serialized MEASUREMENT (one chip, "
        "host-staged exchanges); ICI transfer is the only modeled term",
        "quantity,value,unit,provenance",
        f"graph_nnz,{hg.nnz},nnz,generated community graph "
        f"({args.nodes}x{args.edges} comm={args.comm})",
        f"plan_build,{plan_s:.0f},s,MEASURED host ({plan.local_form} "
        "interior)",
    ]

    if args.epoch:
        # serialized full train step (round-5 mandate #7): epoch = one
        # full-batch fwd+loss+bwd+Adam step (reference protocol)
        from hypergef_tpu.parallel.serial_halo_train import (
            serialized_halo_train_epochs,
        )

        ncls = 8
        y = np.random.default_rng(1).integers(
            0, ncls, size=hg.num_nodes).astype(np.int32)
        mask = (np.random.default_rng(2).random(hg.num_nodes) < 0.5
                ).astype(np.float32)
        est = {}
        t0 = time.time()
        params, losses = serialized_halo_train_epochs(
            plan, x, y, mask, nhid=args.feat, nclass=ncls, epochs=1,
            stats=est)
        ep_wall = time.time() - t0
        dev_s = float(np.sum(est.get("shard_s", [0.0])))
        print(f"serialized TRAIN EPOCH wall {ep_wall:.1f}s "
              f"(fwd layer-shard device+staging {dev_s:.1f}s) "
              f"loss {losses[0]:.4f}", flush=True)
        rows.append(
            f"train_epoch_wall,{ep_wall:.1f},s,MEASURED(serialized) one "
            "full-batch fwd+loss+bwd+Adam step on one chip incl host "
            "staging (2-layer HGNN nhid=%d)" % args.feat)
        rows.append(
            f"train_epoch_loss,{losses[0]:.4f},nll,sanity (finite, "
            f"~ln({ncls})={np.log(ncls):.2f} at init)")

    if args.skip_layer:
        with open(args.out, "a" if args.epoch else "w") as fh:
            fh.write("\n".join(rows) + "\n")
        print("\n".join(rows), flush=True)
        return

    # full serialized layer (output sanity + wall provenance + buffers)
    stats = {}
    t0 = time.time()
    out = serialized_halo_forward(plan, x, stats=stats)
    wall_s = time.time() - t0
    assert np.isfinite(out).all()
    print(f"serialized layer wall {wall_s:.1f}s; "
          f"halo {stats['halo_bytes_real']/1e6:.1f} MB, "
          f"return {stats['return_bytes_real']/1e6:.1f} MB", flush=True)

    # honest chained per-shard compute (shard 0 — all shards share one
    # program shape by construction)
    import jax

    from hypergef_tpu.parallel.serial_halo import _edge_stage
    from hypergef_tpu.ops.tree import apply_levels

    D, f = plan.n_shards, args.feat
    b_cap_h = plan.halo_send_slot.shape[2]
    from hypergef_tpu.parallel.halo_aggr import shard_vertex_features

    xs = shard_vertex_features(plan, x).reshape(D, plan.n_own, f)
    halo_in0 = np.zeros((D, b_cap_h, f), np.float32)

    def step(x_blk, halo_in_d, ops):
        x_t = jnp.take(halo_in_d.reshape(D * b_cap_h, f), ops["halo_idx"],
                       axis=0)
        xe = _edge_stage(plan, x_blk, x_t, ops, "sum", jnp)
        xe = xe * ops["degE"]
        part = apply_levels(xe, ops["v_levels"], ops["v_fi"], ops["v_fm"])
        return chain_fold(part[: x_blk.shape[0]], x_blk)

    ops0 = _shard_ops(plan, 0, jnp)
    r = device_time_per_iter(step, jnp.asarray(xs[0]), iters=args.iters,
                             operands=(jnp.asarray(halo_in0), ops0))
    t_shard = r["per_iter_s"]
    shard_nnz = hg.nnz / D
    print(f"chained shard compute: {t_shard*1e3:.2f} ms "
          f"({t_shard/shard_nnz*1e9:.2f} ns/nnz, compile {r['compile_s']:.0f}s)",
          flush=True)

    # ICI model on REAL buffer sizes (the only modeled term left)
    t_ici = (stats["halo_bytes_real"] + stats["return_bytes_real"]) / (
        args.shards * args.ici_gbps * 1e9
    )
    t_layer = t_shard + t_ici
    rows += [
        f"shard_compute,{t_shard*1e3:.3f},ms,MEASURED(serialized) chained "
        f"on v5e; all {args.shards} shards share this program shape",
        f"shard_ns_per_nnz,{t_shard/shard_nnz*1e9:.3f},ns/nnz,MEASURED(serialized)",
        f"halo_buffer,{stats['halo_bytes_real']/1e6:.1f},MB,REAL plan mask sum",
        f"return_buffer,{stats['return_bytes_real']/1e6:.1f},MB,REAL plan mask sum",
        f"ici_transfer,{t_ici*1e3:.3f},ms,MODELED {args.ici_gbps} GB/s/link "
        "over real buffer bytes",
        f"layer_100M,{t_layer*1e3:.3f},ms,MEASURED(serialized) shard compute "
        "+ modeled ICI only",
        f"aggregate_ns_per_nnz,{t_layer / hg.nnz * 1e9:.3f},ns/nnz,"
        f"layer time / total nnz ({args.shards}-chip slice throughput)",
        f"serialized_wall,{wall_s:.1f},s,full layer on one chip incl. host "
        "staging (provenance)",
        "# r3 fit intercept (-4.5 ms) ELIMINATED: no extrapolation — the "
        "target shard size is measured directly; the intercept was a "
        "line-fit artifact over a convex ns/nnz curve (spill-gather "
        "latency grows faster than band stream with shard size)",
    ]
    with open(args.out, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("\n".join(rows), flush=True)


if __name__ == "__main__":
    main()
