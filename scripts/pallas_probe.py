"""Probe Pallas/Mosaic capabilities for sparse gather strategies on TPU.

Tiny kernels, each timed; failures reported not fatal.  Informs the fused
kernel design (see DESIGN notes in ops/pallas_kernels.py).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, F, R = 4096, 128, 4096  # source rows, features, gather count


def timeit(name, fn, *args, iters=20):
    try:
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.block_until_ready(fn(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name}: ok, {dt*1e6:.1f} us/call (dispatch incl)", flush=True)
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"  {name}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, size=R).astype(np.int32))


# --- K1: jnp.take inside kernel (vmem-resident gather) ----------------
def k1(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)


@jax.jit
def run_k1(x, idx):
    return pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# --- K2: fori_loop of dynamic-slice row loads -------------------------
def k2(x_ref, idx_ref, o_ref):
    def body(i, _):
        o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(idx_ref[i], 1), :]
        return 0

    jax.lax.fori_loop(0, R, body, 0)


@jax.jit
def run_k2(x, idx):
    return pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# --- K3: gather+segment-sum via one-hot MXU matmul per tile -----------
TS = 256  # segment tile


def k3(g_ref, seg_ref, o_ref):
    # g: [R, F] gathered rows; seg: [R] ids in [0, TS); one-hot matmul
    seg = seg_ref[:]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (TS, R), 0) == seg[None, :]
    ).astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        onehot, g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def run_k3(g, seg):
    return pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((TS, F), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(g, seg)


# --- K4: DMA row gather from HBM (pipelined, 8 in flight) -------------
NBUF = 8


def k4(idx_ref, x_hbm, o_ref):
    def body(scratch, sems):
        def get(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[i], 1), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for s in range(NBUF):
            get(s, s).start()

        def loop(i, _):
            slot = jax.lax.rem(i, NBUF)
            get(slot, i).wait()
            o_ref[pl.ds(i, 1), :] = scratch[slot]

            @pl.when(i + NBUF < R)
            def _():
                get(slot, i + NBUF).start()

            return 0

        jax.lax.fori_loop(0, R, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF, 1, F), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


@jax.jit
def run_k4(x, idx):
    return pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, x)


# --- K5: XLA take for comparison --------------------------------------
@jax.jit
def run_k5(x, idx):
    return jnp.take(x, idx, axis=0)


# --- K6: ELL einsum masked-sum inside pallas (chunked partials) -------
NGS = 8
C = R // NGS


def k6(g_ref, m_ref, o_ref):
    # g: [C, NGS, F] gathered; m: [C, NGS]; per-chunk masked sum
    o_ref[:] = jnp.einsum("cgf,cg->cf", g_ref[:], m_ref[:])


@jax.jit
def run_k6(g, m):
    return pl.pallas_call(
        k6,
        out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(g, m)


def main():
    print("devices:", jax.devices(), flush=True)
    want = np.asarray(x)[np.asarray(idx)]

    o = timeit("K5 xla take (baseline)", run_k5, x, idx)
    o = timeit("K1 jnp.take in kernel", run_k1, x, idx)
    if o is not None:
        ok = np.allclose(np.asarray(o), want)
        print("     correct:", ok, flush=True)
    o = timeit("K2 fori dynamic-slice", run_k2, x, idx)
    if o is not None:
        print("     correct:", np.allclose(np.asarray(o), want), flush=True)
    seg = jnp.asarray(np.sort(rng.integers(0, TS, size=R)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(R, F)).astype(np.float32))
    o = timeit("K3 one-hot MXU segsum", run_k3, g, seg)
    if o is not None:
        want3 = np.zeros((TS, F), np.float32)
        np.add.at(want3, np.asarray(seg), np.asarray(g))
        print("     correct:", np.allclose(np.asarray(o), want3, atol=1e-4), flush=True)
    o = timeit("K4 DMA row pipeline", run_k4, x, idx)
    if o is not None:
        print("     correct:", np.allclose(np.asarray(o), want), flush=True)
    ge = jnp.asarray(rng.normal(size=(C, NGS, F)).astype(np.float32))
    me = jnp.asarray((rng.random((C, NGS)) > 0.3).astype(np.float32))
    o = timeit("K6 ELL einsum partials", run_k6, ge, me)
    if o is not None:
        want6 = np.einsum("cgf,cg->cf", np.asarray(ge), np.asarray(me))
        print("     correct:", np.allclose(np.asarray(o), want6, atol=1e-3), flush=True)


if __name__ == "__main__":
    main()
