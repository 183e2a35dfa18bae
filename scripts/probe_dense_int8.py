"""Probe: int8 incidence tables for the dense two-stage backend.

The aligned backend's int8 band tables ride uncast into the
``dot_general`` (the i8->bf16 convert fuses into the dot) and halve
streamed bytes vs bf16 (docs/KERNEL_NOTES.md).  The dense backend still
stores H as bf16 [N, E] capped at 32M entries.  If the same trick holds
for the FULL incidence matmul, the dense regime extends 2x in bytes and
4x vs a hypothetical f32 — and mid-size *uniform-random* graphs
(pubmed-shape: N*E = 157M) escape the ~2-gathers/nnz floor (cumsum
712 us) by streaming the dense H instead: modeled 2 * 157MB / ~700GB/s
= ~450 us.

Measures (honest chain_fold fencing, f=32):
  pubmed-random (19717 x 7963):  dense-i8 vs dense-bf16 vs cumsum
  ModelNet40-shape (12311 x 12311, random): dense-i8 vs tree/cumsum

Run on TPU:
    PYTHONPATH=/root/repo python scripts/probe_dense_int8.py
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

from hypergef_tpu.sparse.hypergraph import Hypergraph
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter


def random_hypergraph(n, e, nnz, seed):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, n, size=nnz)
    ed = rng.integers(0, e, size=nnz)
    key = np.unique(ed.astype(np.int64) * n + v)
    return Hypergraph.from_coo(
        (key % n).astype(np.int64), (key // n).astype(np.int64),
        num_nodes=n, num_edges=e, name="rand")


def two_stage(h, x, degE, degV):
    """diag(degV) H diag(degE) H^T x with h riding its stored dtype.

    degE/degV must be column vectors [E, 1] / [N, 1] (Hypergraph.degE's
    native shape — adding another [:, None] silently broadcasts an
    [E, E, F] intermediate, 456 ms measured vs the real 650 us)."""
    hb = h.astype(jnp.bfloat16)
    xe = jax.lax.dot_general(
        hb, x.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xe = xe * degE
    xv = jax.lax.dot_general(
        hb, xe.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return xv * degV


def bench(tag, hg, f=32, iters=30):
    n, e = hg.num_nodes, hg.num_edges
    dense = np.zeros((n, e), np.int8)
    dense[hg.ht_indices, np.repeat(np.arange(e), np.diff(hg.ht_indptr))] = 1
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    degE = jnp.asarray(hg.degE)
    degV = jnp.asarray(hg.degV)
    h_i8 = jnp.asarray(dense)
    h_bf = jnp.asarray(dense.astype(np.float32)).astype(jnp.bfloat16)
    print(f"=== {tag}: N={n} E={e} nnz={hg.nnz} NE={n*e/1e6:.0f}M "
          f"i8 {n*e/1e6:.0f}MB bf16 {2*n*e/1e6:.0f}MB ===", flush=True)

    for name, h in (("dense-i8", h_i8), ("dense-bf16", h_bf)):
        def step(xv, h_):
            return chain_fold(two_stage(h_, xv, degE, degV), xv)
        t = device_time_per_iter(step, x0, iters=iters, operands=(h,))
        us = t["per_iter_s"] * 1e6
        gb = 2 * (1 if h.dtype == jnp.int8 else 2) * n * e / 1e9
        print(f"  {name:10s}: {us:8.1f} us  (~{gb / t['per_iter_s']:5.0f} GB/s "
              f"over 2 table reads) noisy={t['noisy']}", flush=True)

    # cumsum backend reference (the current auto pick for this regime)
    from hypergef_tpu.ops import fused
    from hypergef_tpu.sparse import planner
    plan = planner.plan_aggregation(hg, with_aligned=False)
    hgd = hg.device_data()
    wdiag = jnp.ones((e, 1), jnp.float32)
    for b in ("cumsum", "tree"):
        def stepb(xv, _):
            y = fused.hgnn_aggregate(hgd, xv, wdiag, "sum", plan, b)
            return chain_fold(y, xv)
        t = device_time_per_iter(stepb, x0, iters=iters, operands=(0,))
        print(f"  {b:10s}: {t['per_iter_s']*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    print(f"dev={jax.devices()[0].platform}")
    bench("pubmed-random", random_hypergraph(19717, 7963, 85762, 0))
    bench("modelnet40-random", random_hypergraph(12311, 12311, 120_000, 1))
