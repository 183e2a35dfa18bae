"""Pallas probe round 2: chained in-jit timing + fixed kernel variants."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, F, R = 4096, 128, 4096
ITERS = 30


def chain_time(name, make_step, x0, check=None):
    """Time a shape-preserving step chained ITERS times in one jit."""
    try:
        def loop(x, n):
            return jax.lax.fori_loop(0, n, lambda i, a: make_step(a), x)

        f = jax.jit(loop, static_argnums=1)
        y1 = jax.block_until_ready(f(x0, 1))
        jax.block_until_ready(f(x0, ITERS + 1))
        t0 = time.perf_counter(); jax.block_until_ready(f(x0, 1))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(f(x0, ITERS + 1))
        t_long = time.perf_counter() - t0
        per = (t_long - t_short) / ITERS
        ok = "" if check is None else f"  correct={check(y1)}"
        print(f"  {name}: {per*1e6:.1f} us/iter{ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"  {name}: FAILED {type(e).__name__}: {msg}", flush=True)


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, size=R).astype(np.int32))
want = np.asarray(x0)[np.asarray(idx)]


def dep(x, o):
    # cheap data dependency to serialize chained iterations
    return x * 1.0 + 0.0 * o


# A: XLA take
def a_step(x):
    return dep(x, jnp.take(x, idx, axis=0))


# B: pallas take_along_axis (dynamic_gather form)
def b_kernel(x_ref, i_ref, o_ref):
    idx2 = jnp.broadcast_to(i_ref[:][:, None], (R, F))
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)


def b_call(x):
    return pl.pallas_call(
        b_kernel,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def b_step(x):
    return dep(x, b_call(x))


# C: pallas serial dynamic-slice rows
def c_kernel(x_ref, i_ref, o_ref):
    def body(i, _):
        o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(i_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, R, body, 0)


def c_call(x):
    return pl.pallas_call(
        c_kernel,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def c_step(x):
    return dep(x, c_call(x))


# D: DMA row pipeline from HBM
NBUF = 16


def d_kernel(i_ref, x_hbm, o_ref):
    def body(scratch, sems):
        def get(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i_ref[i], 1), :], scratch.at[slot], sems.at[slot]
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


def d_call(x):
    return pl.pallas_call(
        d_kernel,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, x)


def d_step(x):
    return dep(x, d_call(x))


# E: masked per-chunk sum, 2D formulation (ELL partials)
NGS = 8
C = R // NGS
mask = jnp.asarray((rng.random((C, NGS)) > 0.3).astype(np.float32))


def e_kernel(g_ref, m_ref, o_ref):
    g = g_ref[:].reshape(C, NGS, F)
    o_ref[:] = jnp.sum(g * m_ref[:][:, :, None], axis=1)


def e_call(g):
    return pl.pallas_call(
        e_kernel,
        out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(g)


def e_step(x):
    return dep(x, e_call(x))


# F: one-hot MXU segment-sum, debug small + timed (XLA formulation too)
TS = 256
seg = jnp.asarray(np.sort(rng.integers(0, TS, size=R)).astype(np.int32))


def f_xla(x):
    onehot = (seg[None, :] == jnp.arange(TS)[:, None]).astype(jnp.float32)
    return dep(x, onehot @ x[:R])


def g_pallas_kernel(g_ref, s_ref, o_ref):
    s = s_ref[:]  # [R] int32
    oh = (jax.lax.broadcasted_iota(jnp.int32, (TS, R), 0) == s[None, :])
    o_ref[:] = jax.lax.dot_general(
        oh.astype(jnp.float32), g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def g_call(x):
    return pl.pallas_call(
        g_pallas_kernel,
        out_shape=jax.ShapeDtypeStruct((TS, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, seg)


def g_step(x):
    return dep(x, g_call(x))


def main():
    print("devices:", jax.devices(), flush=True)
    # correctness of B once, interpreted quickly via direct call
    try:
        got = np.asarray(b_call(x0))
        print("  B correctness:", np.allclose(got, want), flush=True)
    except Exception as e:
        print("  B direct: FAILED", str(e).split("\n")[0][:160], flush=True)
    try:
        got = np.asarray(g_call(x0))
        want_g = np.zeros((TS, F), np.float32)
        np.add.at(want_g, np.asarray(seg), np.asarray(x0)[:R])
        print("  G correctness:", np.allclose(got, want_g, atol=1e-3), flush=True)
    except Exception as e:
        print("  G direct: FAILED", str(e).split("\n")[0][:160], flush=True)

    chain_time("A xla take", a_step, x0)
    chain_time("B pallas take_along_axis", b_step, x0)
    chain_time("C pallas serial slice", c_step, x0)
    chain_time("D pallas DMA pipeline", d_step, x0)
    chain_time("E pallas chunk masked sum", e_step, x0)
    chain_time("F xla one-hot matmul", f_xla, x0)
    chain_time("G pallas one-hot matmul", g_step, x0)


if __name__ == "__main__":
    main()
