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
    try:
        h_i4 = h_i8.astype(jnp.int4)
    except Exception as ex:
        print(f"int4 unsupported on this backend: {type(ex).__name__}: {ex}")
        return
    print(f"=== {tag}: N={n} E={e} nnz={hg.nnz} NE={n*e/1e6:.0f}M "
          f"(i8 {h_i8.nbytes/1e6:.0f}MB, i4 {h_i4.nbytes/1e6:.0f}MB) ===",
          flush=True)

    # correctness first (i4 vs i8 must be bit-identical: 0/1 entries)
    y8 = np.asarray(two_stage(h_i8, x0, degE, degV))
    y4 = np.asarray(two_stage(h_i4, x0, degE, degV))
    err = np.max(np.abs(y8 - y4)) / (np.max(np.abs(y8)) + 1e-30)
    print(f"  i4-vs-i8 rel err: {err:.2e}", flush=True)

    for r in range(rounds):  # interleaved A/B
        line = [f"  round {r}:"]
        for name, h in (("dense-i4", h_i4), ("dense-i8", h_i8)):
            def step(xv, h_):
                return chain_fold(two_stage(h_, xv, degE, degV), xv)
            t = device_time_per_iter(step, x0, iters=iters, operands=(h,))
            us = t["per_iter_s"] * 1e6
            line.append(f"{name} {us:8.1f}us noisy={t['noisy']}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    print(f"dev={jax.devices()[0].platform}")
    bench("pubmed_real-random", random_hypergraph(19717, 7963, 85762, 0))
    bench("modelnet40-random", random_hypergraph(12311, 12311, 120_000, 1))
