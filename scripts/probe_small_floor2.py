"""Small-floor follow-up: is the f32-table 5.5 µs real? (round 4)

probe_small_floor measured the [2708², f32] @ [2708, 32] dot at 5.5 µs
— beneath both the bf16-table HBM stream (17.6 µs marginal, measured)
and even the resident-MXU element bound (9.5 µs), which smells like a
simplifier hoist the full-shape linear fold failed to block.  Verify
with k-chain scaling AND a quadratic fold (no linear rewrite exists
through y·y), then measure the product precomp backend with an f32
table.  If the f32 number survives, cora ≤8 µs (VERDICT #5's bar) is
reachable by a one-line dtype switch; if not, the small-graph floor
entry stands on the bf16 byte bound + 4.4 µs fixed cost.

Run: PYTHONPATH=/root/repo python scripts/probe_small_floor2.py
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

from hypergef_tpu.utils.timing import device_time_per_iter

F = 32
ROUNDS = 3
N = 2708


def dot_leg(n, k, dtype, fold):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)).astype(dtype)
    x0 = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))

    def step(x, a_):
        y = x
        for _ in range(k):
            y = jax.lax.dot_general(
                a_, y.astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if fold == "linear":
            return x + 1e-30 * y
        return x + 1e-30 * jnp.sum(y * y)  # quadratic: unhoistable

    return step, x0, (a,)


def precomp_leg(dtype):
    from hypergef_tpu.data.synthetic import random_hypergraph
    from hypergef_tpu.sparse.planner import DensePrecomp, plan_tree, AggregationPlan
    from hypergef_tpu.ops import fused
    from hypergef_tpu.utils.timing import chain_fold

    hg = random_hypergraph(N, N, avg_edge_size=4.0, seed=0, name="cora")
    pre = DensePrecomp.from_hypergraph(hg)
    pre = DensePrecomp(a=pre.a.astype(dtype), num_nodes=pre.num_nodes)
    plan = AggregationPlan(tree=plan_tree(hg), precomp=pre)
    hgd = hg.device_data()
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, F)).astype(np.float32))

    def step(x, hgd_):
        y = fused.hgnn_aggregate(hgd_, x, None, "sum", plan=plan,
                                 backend="precomp")
        return chain_fold(y, x)

    return step, x0, (hgd,)


def measure(step, x0, operands, iters=300):
    r = device_time_per_iter(step, x0, iters=iters, operands=operands)
    cur = iters
    while cur < 8000 and (r["noisy"] or r["per_iter_s"] * cur < 2.0 * r["dispatch_s"]):
        cur *= 5
        r = device_time_per_iter(step, x0, iters=cur, operands=operands)
    return r["per_iter_s"] * 1e6


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    legs = {
        "f32_k1_lin": dot_leg(N, 1, jnp.float32, "linear"),
        "f32_k2_lin": dot_leg(N, 2, jnp.float32, "linear"),
        "f32_k4_lin": dot_leg(N, 4, jnp.float32, "linear"),
        "f32_k1_quad": dot_leg(N, 1, jnp.float32, "quad"),
        "bf16_k1_quad": dot_leg(N, 1, jnp.bfloat16, "quad"),
        "precomp_f32": precomp_leg(jnp.float32),
        "precomp_bf16": precomp_leg(jnp.bfloat16),
    }
    results = {k: [] for k in legs}
    for rnd in range(ROUNDS):
        for name, (step, x0, ops) in legs.items():
            t = measure(step, x0, ops)
            results[name].append(t)
            print(f"round {rnd} {name}: {t:.2f} us", file=sys.stderr,
                  flush=True)
    print("\n=== summary (min over rounds, us) ===", flush=True)
    for k, v in results.items():
        print(f"{k}: {min(v):.2f}", flush=True)
    k1, k2, k4 = (min(results["f32_k1_lin"]), min(results["f32_k2_lin"]),
                  min(results["f32_k4_lin"]))
    b = (k4 - k1) / 3.0
    print(f"f32 per-dot marginal {b:.2f} us (f32 HBM bound "
          f"{4 * N * N / 732e9 * 1e6:.2f} us)", flush=True)


if __name__ == "__main__":
    main()
