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




# k8: k7 at larger SMEM block sizes — find the SMEM capacity limit
def make_k8(t_big, mask_vmem):
    def fn():
        idx_b = jnp.asarray(rng.integers(0, N, size=(t_big, NGS)).astype(np.int32))
        mask_b = jnp.asarray((rng.random((t_big, NGS)) > 0.1).astype(np.float32))

        def kern(i_ref, m_ref, x_ref, o_ref):
            def body(i, _):
                if mask_vmem:
                    m = m_ref[pl.ds(i, 1), :].reshape(NGS, 1)
                    acc = x_ref[pl.ds(i_ref[i, 0], 1), :] * m[0]
                    for k in range(1, NGS):
                        acc = acc + x_ref[pl.ds(i_ref[i, k], 1), :] * m[k]
                else:
                    acc = x_ref[pl.ds(i_ref[i, 0], 1), :] * m_ref[i, 0]
                    for k in range(1, NGS):
                        acc = acc + x_ref[pl.ds(i_ref[i, k], 1), :] * m_ref[i, k]
                o_ref[pl.ds(i, 1), :] = acc
                return 0

            jax.lax.fori_loop(0, t_big, body, 0)

        m_space = pltpu.VMEM if mask_vmem else pltpu.SMEM
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((t_big, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((t_big, NGS), lambda i: (i, 0), memory_space=m_space),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_big, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_big, F), jnp.float32),
        )(idx_b, mask_b, x)
    return fn



# k9: k7 pattern with grid > 1 (blocked SMEM in_specs + index_map)
def make_k9(t_blk, n_grid):
    def fn():
        t_tot = t_blk * n_grid
        idx_b = jnp.asarray(rng.integers(0, N, size=(t_tot, NGS)).astype(np.int32))
        mask_b = jnp.asarray((rng.random((t_tot, NGS)) > 0.1).astype(np.float32))

        def kern(i_ref, m_ref, x_ref, o_ref):
            def body(i, _):
                acc = x_ref[pl.ds(i_ref[i, 0], 1), :] * m_ref[i, 0]
                for k in range(1, NGS):
                    acc = acc + x_ref[pl.ds(i_ref[i, k], 1), :] * m_ref[i, k]
                o_ref[pl.ds(i, 1), :] = acc
                return 0

            jax.lax.fori_loop(0, t_blk, body, 0)

        return pl.pallas_call(
            kern,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((t_blk, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((t_blk, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_blk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_tot, F), jnp.float32),
        )(idx_b, mask_b, x)
    return fn


# k10: grid>1 + LARGE full-VMEM x operand (5 MB, pubmed-class)
def make_k10(n_big):
    def fn():
        x_big = jnp.asarray(rng.normal(size=(n_big, 64)).astype(np.float32))
        t_blk, n_grid = 64, 4
        t_tot = t_blk * n_grid
        idx_b = jnp.asarray(rng.integers(0, n_big, size=(t_tot, NGS)).astype(np.int32))
        mask_b = jnp.asarray((rng.random((t_tot, NGS)) > 0.1).astype(np.float32))

        def kern(i_ref, m_ref, x_ref, o_ref):
            def body(i, _):
                acc = x_ref[pl.ds(i_ref[i, 0], 1), :] * m_ref[i, 0]
                for k in range(1, NGS):
                    acc = acc + x_ref[pl.ds(i_ref[i, k], 1), :] * m_ref[i, k]
                o_ref[pl.ds(i, 1), :] = acc
                return 0

            jax.lax.fori_loop(0, t_blk, body, 0)

        return pl.pallas_call(
            kern,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((t_blk, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((t_blk, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_blk, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_tot, 64), jnp.float32),
        )(idx_b, mask_b, x_big)
    return fn


K9_CASES = [("k9_g4", make_k9(64, 4)), ("k9_g16_t128", make_k9(128, 16)),
            ("k11_g4_t512", make_k9(512, 4)), ("k11_g4_t256", make_k9(256, 4)),
            ("k10_n19968", make_k10(19968)), ("k10_n8192", make_k10(8192))]


K8_CASES = [(f"k8_t{t}_mv{int(mv)}", make_k8(t, mv)) for t in (128, 256, 512) for mv in (False, True)]

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
        *K8_CASES,
        *K9_CASES,
    ]:
        if only and name.split("_")[0] not in only and name not in only:
            continue
        report(name, fn)
    print("bisect done", flush=True)
