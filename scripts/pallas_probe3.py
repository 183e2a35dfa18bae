"""Probe 3: cost decomposition of the gather/combine pieces at pubmed scale."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30
NNZ, F, N = 85_024, 32, 19_717  # pubmed-ish; NNZ multiple of 8
C = NNZ // 8


def chain_time(name, step, x0):
    try:
        def loop(x, n):
            def body(i, a):
                o = step(a)
                a2 = jax.lax.optimization_barrier((a, o))[0]
                return a2
            return jax.lax.fori_loop(0, n, body, x)

        f = jax.jit(loop, static_argnums=1)
        jax.block_until_ready(f(x0, 1)); jax.block_until_ready(f(x0, ITERS + 1))
        t0 = time.perf_counter(); jax.block_until_ready(f(x0, 1))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(f(x0, ITERS + 1))
        tl = time.perf_counter() - t0
        print(f"  {name}: {(tl-ts)/ITERS*1e6:.1f} us/iter", flush=True)
    except Exception as e:
        print(f"  {name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, size=NNZ).astype(np.int32))
mask = jnp.asarray((rng.random((C, 8)) > 0.2).astype(np.float32))
# tree level tables (fan-in 8) sized for C chunks
C1 = (C + 7) // 8
tidx1 = jnp.asarray(rng.integers(0, C, size=(C1, 8)).astype(np.int32))
tm1 = jnp.asarray((rng.random((C1, 8)) > 0.2).astype(np.float32))

print("devices:", jax.devices(), flush=True)

# 1. gather alone (F=32)
chain_time("take F=32 nnz=85k", lambda x: 0.0 * x + jax.lax.optimization_barrier(
    jnp.take(x, idx, axis=0))[:N], x0)

# 2. cumsum alone
g0 = jnp.asarray(rng.normal(size=(NNZ, F)).astype(np.float32))
chain_time("cumsum [85k,32]", lambda g: jnp.cumsum(g, axis=0), g0)

# 3. chunk reshape-sum alone
chain_time("reshape-sum [C,8,32]",
           lambda g: jnp.broadcast_to(
               (g.reshape(C, 8, F) * mask[:, :, None]).sum(1).repeat(8, 0), g.shape),
           g0)

# 4. full stage: take + chunk-sum + one tree level
def stage(x):
    gathered = jnp.take(x, idx, axis=0)                      # [NNZ, F]
    partial = (gathered.reshape(C, 8, F) * mask[:, :, None]).sum(1)  # [C, F]
    lvl1 = (jnp.take(partial, tidx1, axis=0) * tm1[:, :, None]).sum(1)  # [C1, F]
    out = jnp.zeros_like(x).at[:0].set(0)  # placeholder combine
    return x + 0.0 * jnp.sum(lvl1)

chain_time("stage take+chunk+tree", stage, x0)

# 5. take with 2D index table directly (gather of [C,8] table)
def stage2(x):
    gathered = jnp.take(x, tidx1.reshape(-1) % N, axis=0)
    return x + 0.0 * jnp.sum(gathered)

chain_time("take 2D-table flat", stage2, x0)

# 6. pallas chunk masked sum (fixed arity)
def e_kernel(g_ref, m_ref, o_ref):
    g = g_ref[:].reshape(C, 8, F)
    o_ref[:] = jnp.sum(g * m_ref[:][:, :, None], axis=1)

def e_call(g):
    return pl.pallas_call(
        e_kernel,
        out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(g, mask)

chain_time("pallas chunk-sum", lambda g: jnp.broadcast_to(
    e_call(g).repeat(8, 0), g.shape), g0)

# 7. one-hot MXU debug at small size, CPU-interpretable check on device
TSs, Rs = 8, 64
seg_s = jnp.asarray(np.sort(rng.integers(0, TSs, size=Rs)).astype(np.int32))
g_s = jnp.asarray(rng.normal(size=(Rs, F)).astype(np.float32))

def oh_kernel(g_ref, s_ref, o_ref):
    oh = (jax.lax.broadcasted_iota(jnp.int32, (TSs, Rs), 0) == s_ref[:][None, :])
    o_ref[:] = jax.lax.dot_general(
        oh.astype(jnp.float32), g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

def oh_call(interp):
    return pl.pallas_call(
        oh_kernel,
        out_shape=jax.ShapeDtypeStruct((TSs, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interp,
    )(g_s, seg_s)

want = np.zeros((TSs, F), np.float32)
np.add.at(want, np.asarray(seg_s), np.asarray(g_s))
try:
    got_i = np.asarray(oh_call(True))
    print("  onehot small interpret correct:", np.allclose(got_i, want, atol=1e-4), flush=True)
except Exception as e:
    print("  onehot interpret FAILED:", str(e).splitlines()[0][:160], flush=True)
try:
    got_c = np.asarray(oh_call(False))
    print("  onehot small compiled correct:", np.allclose(got_c, want, atol=1e-4), flush=True)
    if not np.allclose(got_c, want, atol=1e-4):
        print("   got row sums:", got_c.sum(1)[:8], flush=True)
        print("  want row sums:", want.sum(1)[:8], flush=True)
except Exception as e:
    print("  onehot compiled FAILED:", str(e).splitlines()[0][:160], flush=True)
