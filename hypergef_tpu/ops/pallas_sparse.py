"""Pallas sparse level-0 kernels: in-kernel row gather + chunk reduce.

The reference's core kernel fuses gather + per-chunk reduction + atomic
combine in one CUDA kernel (``hgnnaggr_cuda.cu:14-47``).  The TPU
counterpart here fuses the level-0 ELL gather + masked chunk-sum of the
reduction tree into one Pallas kernel, in two variants:

* ``vmem`` — X resident in VMEM (guarded by a byte budget), serial
  per-row dynamic-slice loads (~8 ns/row measured, Mosaic has no
  vectorized gather) with the whole chunk reduced in-register — no
  [C, ngs, F] HBM intermediate, no lane-padding blowup;
* ``dma``  — X stays in HBM (`pl.ANY`), per-row async DMAs pipelined
  across ``n_buf`` chunk buffers (the Mosaic answer to the ~200 ns/row
  HBM-latency gather XLA pays for large X — many DMAs in flight).

Mosaic constraint (measured, scripts/probe_r2b_bisect.py): SMEM index
blocks above ~(256, 8) int32 with grid pipelining crash the compiler —
``BLOCK_CHUNKS`` stays at 256.

The deeper tree levels and the custom VJP live in :mod:`ops.tree`;
these kernels only replace the level-0 stage application.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_CHUNKS = 256  # SMEM-safe (bisect: 512 crashes Mosaic, 256 compiles)
VMEM_X_BUDGET = 10 * 1024 * 1024  # leave room for blocks/scratch in ~16MB


def _vmem_kernel(ngs, block, idx_ref, mask_ref, x_ref, o_ref):
    def body(i, _):
        acc = x_ref[pl.ds(idx_ref[i, 0], 1), :] * mask_ref[i, 0]
        for k in range(1, ngs):
            acc = acc + x_ref[pl.ds(idx_ref[i, k], 1), :] * mask_ref[i, k]
        o_ref[pl.ds(i, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, block, body, 0)


def _dma_kernel(ngs, block, n_buf, idx_ref, mask_ref, x_hbm, o_ref, bufs, sems):
    f = o_ref.shape[1]

    def start_chunk(b, i):
        for k in range(ngs):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[i, k], 1), :],
                bufs.at[b, pl.ds(k, 1), :],
                sems.at[b],
            ).start()

    def wait_chunk(b, i):
        for k in range(ngs):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[i, k], 1), :],
                bufs.at[b, pl.ds(k, 1), :],
                sems.at[b],
            ).wait()

    for b in range(n_buf):
        start_chunk(b, b)

    def body(j, _):
        base = j * n_buf
        for b in range(n_buf):
            i = base + b
            wait_chunk(b, i)
            acc = jnp.sum(
                bufs[b] * mask_ref[pl.ds(i, 1), :].reshape(ngs, 1), axis=0
            )
            o_ref[pl.ds(i, 1), :] = acc.reshape(1, f)

            @pl.when(i + n_buf < block)
            def _():
                start_chunk(b, i + n_buf)
        return 0

    jax.lax.fori_loop(0, block // n_buf, body, 0)


def _pad_tables(gidx, mask, block):
    c = gidx.shape[0]
    c_pad = -(-c // block) * block
    if c_pad != c:
        gidx = jnp.pad(gidx, ((0, c_pad - c), (0, 0)))
        mask = jnp.pad(mask, ((0, c_pad - c), (0, 0)))
    return gidx, mask, c


@functools.partial(jax.jit, static_argnames=("impl", "n_buf", "interpret"))
def ell_gather_sum(x, gidx, mask, impl="auto", n_buf=8, interpret=False):
    """Fused level-0 stage: ``out[c] = Σ_k x[gidx[c,k]]·mask[c,k]``.

    x: [N, F] f32; gidx: [C, ngs] int32; mask: [C, ngs] f32 → [C, F].
    """
    c0, ngs = gidx.shape
    f = x.shape[1]
    if impl == "auto":
        impl = "vmem" if x.size * x.dtype.itemsize <= VMEM_X_BUDGET else "dma"
    gidx, mask, c0 = _pad_tables(gidx, mask, BLOCK_CHUNKS)
    c = gidx.shape[0]
    grid = (c // BLOCK_CHUNKS,)
    if impl == "vmem":
        out = pl.pallas_call(
            functools.partial(_vmem_kernel, ngs, BLOCK_CHUNKS),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_CHUNKS, ngs), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BLOCK_CHUNKS, ngs), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_CHUNKS, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, f), jnp.float32),
            interpret=interpret,
        )(gidx, mask, x)
    elif impl == "dma":
        out = pl.pallas_call(
            functools.partial(_dma_kernel, ngs, BLOCK_CHUNKS, n_buf),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_CHUNKS, ngs), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BLOCK_CHUNKS, ngs), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BLOCK_CHUNKS, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, f), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_buf, ngs, f), jnp.float32),
                pltpu.SemaphoreType.DMA((n_buf,)),
            ],
            interpret=interpret,
        )(gidx, mask, x)
    else:
        raise ValueError(impl)
    return out[:c0]
