"""Probe: block-triangular MXU scan — precision tier vs cost/error.

Follow-up to probe_random_floor.py (triscan 47 us vs cumsum 326 us on
[85k, 32]): pick the precision tier for the production swap in
ops/segments.py.  DEFAULT on TPU rounds the values operand to bf16
(~1e-3 rel); HIGHEST uses multi-pass bf16 for ~f32 accuracy.  Also
check the *segment-difference* error (what the backend actually
computes), not just raw prefix error.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hypergef_tpu.utils.timing import device_time_per_iter

NNZ, F, B = 85021, 32, 128
ITERS = 60

rng = np.random.default_rng(0)
v_np = rng.normal(size=(NNZ, F)).astype(np.float32)
v0 = jnp.asarray(v_np)
nb = -(-NNZ // B)
pad = nb * B - NNZ
LT = jnp.asarray(np.tril(np.ones((B, B), np.float32)))

# random segment boundaries (like a CSR indptr, ~4.3 nnz/segment)
S = NNZ // 4
bounds = np.sort(rng.choice(NNZ, size=S - 1, replace=False))
indptr = np.concatenate([[0], bounds, [NNZ]]).astype(np.int64)


def triscan(v, precision):
    vp = jnp.pad(v, ((0, pad), (0, 0)))
    blk = vp.reshape(nb, B, F)
    pre = jax.lax.dot_general(
        LT, blk, (((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)
    pre = jnp.transpose(pre, (1, 0, 2))
    tot = blk.sum(axis=1)
    carry = jnp.cumsum(tot, axis=0) - tot
    return (pre + carry[:, None, :]).reshape(nb * B, F)[:NNZ]


def seg_of(pref_np):
    padded = np.concatenate([np.zeros((1, F), pref_np.dtype), pref_np], axis=0)
    return padded[indptr[1:]] - padded[indptr[:-1]]


ref_seg = seg_of(np.cumsum(v_np.astype(np.float64), axis=0))

# also measure the error of the status-quo f32 jnp.cumsum for context
base_pref = np.asarray(jnp.cumsum(v0, axis=0))


def seg_err(pref_np):
    d = np.abs(seg_of(pref_np) - ref_seg)
    scale = np.maximum(np.abs(ref_seg), 1.0)
    return (d / scale).max()


print(f"jnp.cumsum f32   seg rel err {seg_err(base_pref):.2e}", flush=True)

for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                   ("HIGHEST", jax.lax.Precision.HIGHEST)]:
    got = np.asarray(triscan(v0, prec))
    e = seg_err(got)
    times = []
    for _ in range(3):
        r = device_time_per_iter(
            lambda a, p=prec: a + 1e-30 * triscan(a, p), v0, iters=ITERS)
        times.append(r["per_iter_s"] * 1e6)
    print(f"triscan {name:8s} seg rel err {e:.2e}  "
          f"median {sorted(times)[1]:7.1f} us  ({['%.0f' % t for t in times]})",
          flush=True)
