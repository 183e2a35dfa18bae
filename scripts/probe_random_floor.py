"""Probe: where does the uniform-random pubmed-shape fused layer spend
its ~1.3 ms? (r1 measured: cumsum 1336 µs vs ~700 µs theoretical
2-gathers-per-nnz floor — KERNEL_NOTES "uniform-random floor").

Components measured interleaved in one process (iters>=60, honest
value-fetch fencing):

  full_cumsum   the fused layer, cumsum backend
  full_tree     the fused layer, tree backend
  gather_nnz    one 85k-row gather from X [19717, 32]
  cumsum_nnz    jnp.cumsum over [85k, 32] f32
  triscan_nnz   block prefix via 128x128 lower-triangular f32 matmul
                (MXU candidate replacement for cumsum)
  boundary      2x 19717-row gathers from the padded prefix

If cumsum_nnz >> triscan_nnz, swapping the scan implementation in
ops/segments.py closes part of the uniform-random gap.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hypergef_tpu.data.synthetic import random_hypergraph
from hypergef_tpu.ops import fused
from hypergef_tpu.sparse.planner import plan_aggregation
from hypergef_tpu.utils.timing import device_time_per_iter

N = E = 19717
F = 32
ITERS = 60

hg = random_hypergraph(N, E, avg_edge_size=4.3, seed=0, name="pubmed-rand")
plan = plan_aggregation(hg)
hgd = hg.device_data()
nnz = hg.nnz
print(f"nnz={nnz}", flush=True)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, N, size=nnz).astype(np.int32))
v0 = jnp.asarray(rng.normal(size=(nnz, F)).astype(np.float32) * 1e-3)
bidx = jnp.asarray(rng.integers(0, nnz + 1, size=N).astype(np.int32))

# block-triangular scan pieces
B = 128
nb = -(-nnz // B)
pad = nb * B - nnz
LT = jnp.asarray(np.tril(np.ones((B, B), np.float32)))


def triscan(v):
    vp = jnp.pad(v, ((0, pad), (0, 0)))
    blk = vp.reshape(nb, B, F)
    # within-block inclusive prefix: LT @ blk  (MXU batch matmul, f32)
    pre = jax.lax.dot_general(
        LT, blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, nb, F] -> transpose
    pre = jnp.transpose(pre, (1, 0, 2))
    tot = blk.sum(axis=1)  # [nb, F]
    carry = jnp.cumsum(tot, axis=0) - tot  # exclusive block carry
    out = pre + carry[:, None, :]
    return out.reshape(nb * B, F)[:nnz]


def check():
    ref = np.cumsum(np.asarray(v0), axis=0)
    got = np.asarray(triscan(v0))
    err = np.abs(ref - got).max() / max(1e-9, np.abs(ref).max())
    print(f"triscan rel err vs cumsum: {err:.2e}", flush=True)


check()

steps = {
    "full_cumsum": lambda a: fused.hgnn_aggregate(
        hgd, a, None, "sum", plan=plan, backend="cumsum"),
    "full_tree": lambda a: fused.hgnn_aggregate(
        hgd, a, None, "sum", plan=plan, backend="tree"),
    "gather_nnz": lambda a: a + 1e-30 * jnp.sum(
        jnp.square(jnp.take(a, ids, axis=0))),
    "cumsum_nnz": lambda a: a + 1e-30 * jnp.cumsum(a, axis=0),
    "triscan_nnz": lambda a: a + 1e-30 * triscan(a),
    "boundary": lambda a: a + 1e-30 * jnp.sum(jnp.square(
        jnp.take(a, bidx, axis=0))),
}
args = {
    "full_cumsum": x0, "full_tree": x0, "gather_nnz": x0,
    "cumsum_nnz": v0, "triscan_nnz": v0, "boundary": v0,
}

# 3 interleaved rounds (session drift is +-30%)
results = {k: [] for k in steps}
for rnd in range(3):
    for k, fn in steps.items():
        r = device_time_per_iter(fn, args[k], iters=ITERS)
        us = r["per_iter_s"] * 1e6
        results[k].append(us)
        print(f"round{rnd} {k:12s} {us:9.1f} us  (compile {r['compile_s']:.0f}s"
              f"{' NOISY' if r.get('noisy') else ''})", flush=True)

print("\n=== medians ===")
for k, v in results.items():
    print(f"{k:12s} {sorted(v)[1]:9.1f} us", flush=True)
