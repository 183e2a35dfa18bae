"""Probe: int4 incidence tables for the dense two-stage backend.

The dense-i8 stream (DenseIncidence, planner.py) runs at ~730 GB/s —
~90% of v5e HBM bandwidth — so the only remaining lever for the
unstructured mid-size regime is fewer bytes.  XLA packs int4 two
entries per byte on TPU; if the i4->bf16 convert fuses into the
dot_general operand read like the i8 convert does, the dense table
stream halves again (pubmed_real modeled ~2*78MB / 730GB/s = ~215 us
-> ~110 us) and the N*E routing gate doubles.

Binary incidence fits int4 trivially (entries are 0/1 membership
counts; multiplicities >7 would saturate, but from_coo dedups to 0/1).

Measures (honest chain_fold fencing, f=32, interleaved):
  pubmed_real-random (19717 x 7963): dense-i4 vs dense-i8
  ModelNet40-random  (12311 x 12311): dense-i4 vs dense-i8

Run on TPU:
    PYTHONPATH=/root/repo python scripts/probe_dense_int4.py

RESULT (TPU v5e, 2026-08-18, interleaved, i4 bit-exact vs i8):
    pubmed_real-random: dense-i4 185-235 us vs dense-i8 438-469 us
    modelnet40-random:  dense-i4  89-219 us vs dense-i8 425-450 us
...but this is a **NEGATIVE result end-to-end**: these numbers time
only the dots (the i8->i4 conversion sits before the fori_loop and the
T(K+1)-T(1) differencing cancels it).  In production the unpack runs
inside each per-layer op call, XLA's S4 materialization is ~40 GB/s
(~4 ms here) and is never hoisted out of loop bodies -> every
placement measured 4.3-4.7 ms/layer vs 0.4 ms int8.  int8 stays the
default; packed int4 is an explicit opt-in (dtype=jnp.int4).  Full
chain of findings: docs/KERNEL_NOTES.md "packed int4 dense incidence".
Gotchas hit on the way:
 * axon cannot pass/redistribute S4 arrays across jit boundaries
   (RecursionError in _array_shard_arg) -> carrier stays int8.
 * XLA CONSTANT-FOLDS the S4 bitcast of a closure-captured carrier
   INCORRECTLY (wrong nibbles, CPU-verified) -> the opt-in unpack
   sits behind jax.lax.optimization_barrier (ops/fused._dense_dot).
 * the fused (unmaterialized) bitcast->dot form is itself 7-10x slow.
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
from probe_dense_int8 import random_hypergraph, two_stage


def bench(tag, hg, f=32, iters=30, rounds=3):
    n, e = hg.num_nodes, hg.num_edges
    dense = np.zeros((n, e), np.int8)
    dense[hg.ht_indices, np.repeat(np.arange(e), np.diff(hg.ht_indptr))] = 1
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    degE = jnp.asarray(hg.degE)
    degV = jnp.asarray(hg.degV)
    h_i8 = jnp.asarray(dense)
    print(f"=== {tag}: N={n} E={e} nnz={hg.nnz} NE={n*e/1e6:.0f}M "
          f"(i8 {n*e/1e6:.0f}MB, i4 {n*e/2e6:.0f}MB) ===", flush=True)

    # The axon plugin cannot device_put / re-shard S4 arrays across jit
    # boundaries (RecursionError in _array_shard_arg, 2026-08-18), so the
    # i8->i4 conversion happens ONCE INSIDE the timed program, before the
    # fori_loop, behind an optimization_barrier (forcing XLA to
    # materialize the S4 table in HBM rather than re-deriving bf16 from
    # the i8 operand inside the loop).  device_time_per_iter's
    # T(K+1)-T(1) differencing cancels the one-time conversion cost, so
    # the reported per-iter time is the steady-state S4-stream time.
    def make_loop(to_i4):
        def loop(x0_, n_, h8):
            h = h8.astype(jnp.int4) if to_i4 else h8
            h = jax.lax.optimization_barrier(h)
            def body(i, a):
                return chain_fold(two_stage(h, a, degE, degV), a)
            return jax.lax.fori_loop(0, n_, body, x0_)
        return jax.jit(loop, static_argnums=1)

    # correctness first (i4 vs i8 must be bit-identical: 0/1 entries)
    try:
        y4 = np.asarray(make_loop(True)(x0, 1, h_i8))
    except Exception as ex:
        print(f"int4 unsupported on this backend: {type(ex).__name__}: "
              f"{str(ex)[:200]}")
        return
    y8 = np.asarray(make_loop(False)(x0, 1, h_i8))
    err = np.max(np.abs(y8 - y4)) / (np.max(np.abs(y8)) + 1e-30)
    print(f"  i4-vs-i8 rel err: {err:.2e}", flush=True)

    import time as _time
    fns = {"dense-i4": make_loop(True), "dense-i8": make_loop(False)}
    from hypergef_tpu.utils.timing import sync
    for name, fn in fns.items():  # warm both compiles
        sync(fn(x0, 1, h_i8)); sync(fn(x0, iters + 1, h_i8))

    def timed(fn, k, repeats=5):
        best = float("inf")
        for _ in range(repeats):
            t0 = _time.perf_counter()
            sync(fn(x0, k, h_i8))
            best = min(best, _time.perf_counter() - t0)
        return best

    for r in range(rounds):  # interleaved A/B
        line = [f"  round {r}:"]
        for name, fn in fns.items():
            per = (timed(fn, iters + 1) - timed(fn, 1)) / iters
            line.append(f"{name} {per*1e6:8.1f}us")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    print(f"dev={jax.devices()[0].platform}")
    bench("pubmed_real-random", random_hypergraph(19717, 7963, 85762, 0))
    bench("modelnet40-random", random_hypergraph(12311, 12311, 120_000, 1))
