"""Bisect which Pallas/Mosaic construct crashes the TPU remote compiler.

Round-2 gather probes failed with opaque HTTP 500 (tpu_compile_helper
exit 1) for every kernel using SMEM-blocked inputs / ANY inputs / DMA.
This ladder adds one construct at a time; each case just compiles + runs
on tiny shapes and prints ok/fail.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 128
N = 1024
T = 64  # chunks per block
NGS = 8


def report(name, fn):
    try:
        out = fn()
        s = float(jnp.sum(out))
        print(f"  {name}: ok (sum={s:.3f})", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:180]
        print(f"  {name}: FAILED {type(e).__name__}: {msg}", flush=True)
        return False


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, size=(T, NGS)).astype(np.int32))
mask = jnp.asarray((rng.random((T, NGS)) > 0.1).astype(np.float32))


# k0: plain grid + VMEM blocks (round-1 known-good baseline)
def k0():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    return pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec((N // 4, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N // 4, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
    )(x)


# k1: SMEM-blocked int32 input, scalar reads
def k1():
    def kern(i_ref, x_ref, o_ref):
        v = x_ref[pl.ds(i_ref[0, 0], 1), :]
        o_ref[:] = jnp.broadcast_to(v, o_ref.shape)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, F), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
    )(idx, x)


# k1b: SMEM-blocked input but VMEM output
def k1b():
    def kern(i_ref, x_ref, o_ref):
        v = x_ref[pl.ds(i_ref[0, 0], 1), :]
        o_ref[:] = jnp.broadcast_to(v, o_ref.shape)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
    )(idx, x)


# k2: input left in ANY memory space, copied via DMA (static slice)
def k2():
    def kern(x_hbm, o_ref, buf, sem):
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8), :], buf, sem)
        dma.start()
        dma.wait()
        o_ref[:] = buf[:]

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x)


# k3: DMA with dynamic row offset from SMEM scalar
def k3():
    def kern(i_ref, x_hbm, o_ref, buf, sem):
        r = i_ref[0, 0]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(r, 8), :], buf, sem)
        dma.start()
        dma.wait()
        o_ref[:] = buf[:]

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idx, x)


# k4: single-row DMA (pl.ds(r, 1)) — row granularity
def k4():
    def kern(i_ref, x_hbm, o_ref, buf, sem):
        r = i_ref[0, 1]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(r, 1), :], buf, sem)
        dma.start()
        dma.wait()
        o_ref[:] = jnp.broadcast_to(buf[:], o_ref.shape)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idx, x)


# k5: semaphore ARRAY + 3-D scratch with .at[b, ds(k,1), :]
def k5():
    def kern(i_ref, x_hbm, o_ref, bufs, sems):
        for b in range(2):
            for k in range(2):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i_ref[b, k], 1), :],
                    bufs.at[b, pl.ds(k, 1), :],
                    sems.at[b],
                ).start()
        for b in range(2):
            for k in range(2):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i_ref[b, k], 1), :],
                    bufs.at[b, pl.ds(k, 1), :],
                    sems.at[b],
                ).wait()
        o_ref[:] = bufs[0] + bufs[1]

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(idx, x)


# k6: DMAs inside fori_loop with dynamic output row write
def k6():
    def kern(i_ref, x_hbm, o_ref, buf, sem):
        def body(i, _):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i_ref[i, 0], 1), :], buf, sem
            )
            dma.start()
            dma.wait()
            o_ref[pl.ds(i, 1), :] = buf[:]
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idx, x)


# k7: VMEM-resident x + serial row loads (the pallas_vmem pattern)
def k7():
    def kern(i_ref, m_ref, x_ref, o_ref):
        def body(i, _):
            acc = x_ref[pl.ds(i_ref[i, 0], 1), :] * m_ref[i, 0]
            for k in range(1, NGS):
                acc = acc + x_ref[pl.ds(i_ref[i, k], 1), :] * m_ref[i, k]
            o_ref[pl.ds(i, 1), :] = acc
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
    )(idx, mask, x)


# k7b: same but mask read from VMEM as a row vector
def k7b():
    def kern(i_ref, m_ref, x_ref, o_ref):
        def body(i, _):
            m = m_ref[pl.ds(i, 1), :].reshape(NGS, 1)
            rows = x_ref[pl.ds(i_ref[i, 0], 1), :]
            for k in range(1, NGS):
                rows = jnp.concatenate(
                    [rows, x_ref[pl.ds(i_ref[i, k], 1), :]], axis=0
                )
            acc = jnp.sum(rows * m, axis=0, keepdims=True)
            o_ref[pl.ds(i, 1), :] = acc
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, NGS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
    )(idx, mask, x)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for name, fn in [
        ("k0_plain_grid", k0),
        ("k1_smem_block_in", k1),
        ("k1b_smem_in_vmem_out", k1b),
        ("k2_any_dma_static", k2),
        ("k3_dma_dyn_offset", k3),
        ("k4_dma_single_row", k4),
        ("k5_sem_array_3d", k5),
        ("k6_dma_in_loop", k6),
        ("k7_vmem_serial", k7),
        ("k7b_vmem_concat", k7b),
    ]:
        if only and name.split("_")[0] not in only and name not in only:
            continue
        report(name, fn)
    print("bisect done", flush=True)
