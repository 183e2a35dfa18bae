"""Small-graph (cora-regime) floor isolation — round-4 mandate #5.

Question: cora f=32 best committed is 14.2 µs (precomp backend = ONE
[2708,2708]bf16 @ [2708,32] dot) vs the reference's 4.79 µs on a 3090.
What binds at the ~10 µs scale on v5e?  Candidate bounds:

* MXU A-element rate: 2708² = 7.33M elements / 768 G/s ≈ 9.6 µs — the
  floor IF the table stays VMEM-resident across loop iterations;
* HBM byte stream: bf16 table = 14.7 MB / 732 GB/s ≈ 20 µs — the floor
  if the table re-streams every iteration;
* per-op fixed cost: measured here by fitting a + b·k over k chained
  identical dots.

Legs (interleaved, honest chain-fold fencing, 3 rounds):
  A. lone dot [2708,2708]bf16 @ [2708,32]f32→f32, k = 1, 2, 4 chained
  B. same at half size (1354²) and quarter (677²) — element scaling
  C. product precomp backend (fused.hgnn_aggregate) on cora-shaped graph
  D. product dense backend (two-stage int8) for reference
  E. f32 table variant of A (2× bytes, same elements)

Output: stderr table + KERNEL_NOTES-ready summary.
Run: PYTHONPATH=/root/repo python scripts/probe_small_floor.py
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

from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter

F = 32
ROUNDS = 3


def lone_dot_leg(n, k, dtype):
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
        return chain_fold(y, x)

    return step, x0, (a,)


def product_leg(backend):
    from hypergef_tpu.data.synthetic import random_hypergraph
    from hypergef_tpu.ops import fused
    from hypergef_tpu.sparse.planner import plan_aggregation

    hg = random_hypergraph(2708, 2708, avg_edge_size=4.0, seed=0, name="cora")
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(2708, F)).astype(np.float32))

    def step(x, hgd_):
        y = fused.hgnn_aggregate(hgd_, x, None, "sum", plan=plan,
                                 backend=backend)
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
        "dot2708_bf16_k1": lone_dot_leg(2708, 1, jnp.bfloat16),
        "dot2708_bf16_k2": lone_dot_leg(2708, 2, jnp.bfloat16),
        "dot2708_bf16_k4": lone_dot_leg(2708, 4, jnp.bfloat16),
        "dot1354_bf16_k1": lone_dot_leg(1354, 1, jnp.bfloat16),
        "dot677_bf16_k1": lone_dot_leg(677, 1, jnp.bfloat16),
        "dot2708_f32_k1": lone_dot_leg(2708, 1, jnp.float32),
        "precomp_product": product_leg("precomp"),
        "dense_product": product_leg("dense"),
    }
    results = {k: [] for k in legs}
    for rnd in range(ROUNDS):
        for name, (step, x0, ops) in legs.items():
            t = measure(step, x0, ops)
            results[name].append(t)
            print(f"round {rnd} {name}: {t:.2f} us", file=sys.stderr,
                  flush=True)
    print("\n=== summary (min over rounds, us) ===", flush=True)
    mins = {k: min(v) for k, v in results.items()}
    for k, v in mins.items():
        print(f"{k}: {v:.2f}", flush=True)
    # fixed-cost fit from k-chain: t(k) = a + b*k
    k1, k2, k4 = (mins["dot2708_bf16_k1"], mins["dot2708_bf16_k2"],
                  mins["dot2708_bf16_k4"])
    b = (k4 - k1) / 3.0
    a = k1 - b
    elems_us = 2708 * 2708 / 768e9 * 1e6
    bytes_us = 2 * 2708 * 2708 / 732e9 * 1e6
    print(f"\nper-dot marginal cost b = {b:.2f} us "
          f"(A-elem bound {elems_us:.2f}, bf16 HBM bound {bytes_us:.2f})",
          flush=True)
    print(f"per-program fixed cost a = {a:.2f} us", flush=True)
    print(f"precomp product = {mins['precomp_product']:.2f} us "
          f"(lone dot k1 = {k1:.2f}); product overhead = "
          f"{mins['precomp_product'] - k1:.2f} us", flush=True)


if __name__ == "__main__":
    main()
