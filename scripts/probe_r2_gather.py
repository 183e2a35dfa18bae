"""Round-2 probe: candidate sparse gather/aggregate kernels, honest fencing.

Decides the round-2 sparse backend design (VERDICT.md next-round item 1).
Candidates measured per ELL level-0 stage (gather nnz rows + masked
chunk-sum -> [C, F] partials):

  xla_gather      flat jnp.take of nnz rows (cost floor reference)
  xla_sorted      same with pre-sorted indices (does locality help XLA?)
  xla_ell         take + reshape + masked sum (today's tree level 0)
  pallas_vmem     X fully VMEM-resident, serial per-row loads (mid-size)
  pallas_dma      X in HBM, chunk-granular pipelined row DMAs (B buffers)
  multihot        scan over x-tiles, tile-local multihot bf16 matmul (MXU)
                  - measured with random AND block-local (clustered) indices

Scales: "pubmed" (N=19720, nnz=85k, F=64) and "big" (N=2M, nnz=10M, F=32).
Run on TPU via:  nohup python scripts/probe_r2_gather.py > /tmp/probe_r2.log 2>&1 &
Select subsets:  PROBE_CASES=pallas_dma,multihot PROBE_SCALES=big ...
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

CASES = os.environ.get("PROBE_CASES", "").split(",") if os.environ.get("PROBE_CASES") else None
SCALES = os.environ.get("PROBE_SCALES", "pubmed,big").split(",")

NGS = 8


def log(msg):
    print(msg, flush=True)


def sync(y):
    leaves = jax.tree_util.tree_leaves(y)
    return float(jnp.sum(leaves[0]))


def chain_time(name, step, x0, operands=(), iters=20, repeats=3):
    """step(x, *operands) -> array reduced into the carry (true data dep)."""
    try:
        def loop(x, n, *ops):
            def body(i, a):
                o = step(a, *ops)
                # optimization_barrier keeps o live and defeats algebraic
                # simplification (a plain scalar fold let XLA elide whole
                # gathers — measured negative times)
                return jax.lax.optimization_barrier((a, o))[0]
            return jax.lax.fori_loop(0, n, body, x)

        f = jax.jit(loop, static_argnums=1)
        t0 = time.perf_counter()
        sync(f(x0, 1, *operands))
        sync(f(x0, iters + 1, *operands))
        compile_s = time.perf_counter() - t0

        def timed(n):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                sync(f(x0, n, *operands))
                best = min(best, time.perf_counter() - t0)
            return best

        ts, tl = timed(1), timed(iters + 1)
        per = (tl - ts) / iters
        log(f"  {name}: {per*1e6:9.1f} us/iter   (compile {compile_s:.1f}s)")
        return per
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        log(f"  {name}: FAILED {type(e).__name__}: {msg}")
        return None


# ----------------------------------------------------------------------
# pallas kernels
# ----------------------------------------------------------------------
def _vmem_kernel(idx_ref, mask_ref, x_ref, o_ref):
    """X fully VMEM; serial per-row loads, NGS-unrolled per chunk."""
    t = o_ref.shape[0]

    def body(i, _):
        acc = x_ref[pl.ds(idx_ref[i, 0], 1), :] * mask_ref[i, 0]
        for k in range(1, NGS):
            acc = acc + x_ref[pl.ds(idx_ref[i, k], 1), :] * mask_ref[i, k]
        o_ref[pl.ds(i, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, t, body, 0)


def pallas_vmem_stage(x, gidx, gmask, block_chunks=256):
    c = gidx.shape[0]
    f = x.shape[1]
    grid = (c // block_chunks,)
    return pl.pallas_call(
        _vmem_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_chunks, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_chunks, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_chunks, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, f), jnp.float32),
        interpret=INTERPRET,
    )(gidx, gmask, x)


def _make_dma_kernel(n_buf, block_chunks):
    def kernel(idx_ref, mask_ref, x_hbm, o_ref, bufs, sems):
        f = o_ref.shape[1]

        def start_chunk(b, i):
            for k in range(NGS):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(idx_ref[i, k], 1), :],
                    bufs.at[b, pl.ds(k, 1), :],
                    sems.at[b],
                ).start()

        def wait_chunk(b, i):
            for k in range(NGS):
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
                acc = jnp.sum(bufs[b] * mask_ref[pl.ds(i, 1), :].reshape(NGS, 1), axis=0)
                o_ref[pl.ds(i, 1), :] = acc.reshape(1, f)

                @pl.when(i + n_buf < block_chunks)
                def _():
                    start_chunk(b, i + n_buf)
            return 0

        jax.lax.fori_loop(0, block_chunks // n_buf, body, 0)

    return kernel


def pallas_dma_stage(x, gidx, gmask, block_chunks=512, n_buf=8):
    c = gidx.shape[0]
    f = x.shape[1]
    grid = (c // block_chunks,)
    return pl.pallas_call(
        _make_dma_kernel(n_buf, block_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_chunks, NGS), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_chunks, NGS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_chunks, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, f), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_buf, NGS, f), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=INTERPRET,
    )(gidx, gmask, x)


# ----------------------------------------------------------------------
# multihot MXU stage (XLA scan formulation)
# ----------------------------------------------------------------------
def multihot_stage(xp, tgidx, tmask, tile_rows):
    """xp: [n_tiles*tile_rows, F]; tgidx/tmask: [n_tiles, c_max, NGS]
    (tile-local row ids).  Returns [n_tiles, c_max, F] partials."""
    n_tiles, c_max, _ = tgidx.shape

    def body(carry, inp):
        t_gidx, t_mask, t = inp
        xt = jax.lax.dynamic_slice_in_dim(xp, t * tile_rows, tile_rows, axis=0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (c_max, tile_rows), 1)
        m = jnp.zeros((c_max, tile_rows), jnp.bfloat16)
        for k in range(NGS):
            m = m + jnp.where(
                t_gidx[:, k : k + 1] == iota, t_mask[:, k : k + 1], 0.0
            ).astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            m, xt.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry, p

    _, partials = jax.lax.scan(
        body, 0, (tgidx, tmask, jnp.arange(n_tiles, dtype=jnp.int32))
    )
    return partials


# ----------------------------------------------------------------------
# workloads
# ----------------------------------------------------------------------
def build_case(n, nnz, f, seed, clustered_tile=0):
    """Random ELL tables; if clustered_tile>0, draw each chunk's indices
    from one random tile of that many rows (perfect block locality)."""
    rng = np.random.default_rng(seed)
    c = nnz // NGS
    if clustered_tile:
        tile_of_chunk = rng.integers(0, n // clustered_tile, size=c)
        local = rng.integers(0, clustered_tile, size=(c, NGS))
        gidx = (tile_of_chunk[:, None] * clustered_tile + local).astype(np.int32)
    else:
        gidx = rng.integers(0, n, size=(c, NGS)).astype(np.int32)
    gmask = (rng.random((c, NGS)) > 0.1).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return x, gidx, gmask


def bucket_by_tile(gidx, gmask, n, tile_rows):
    """Re-cut ELL chunks at tile boundaries -> [n_tiles, c_max, NGS] local."""
    c = gidx.shape[0]
    flat_idx = gidx.reshape(-1)
    flat_mask = gmask.reshape(-1)
    entry_chunk = np.repeat(np.arange(c), NGS)
    tile = flat_idx // tile_rows
    # group entries by (chunk, tile); each group becomes >=1 new chunk
    order = np.lexsort((tile, entry_chunk))
    fi, fm, ec, tl = flat_idx[order], flat_mask[order], entry_chunk[order], tile[order]
    new_run = np.ones(fi.shape[0], dtype=bool)
    new_run[1:] = (ec[1:] != ec[:-1]) | (tl[1:] != tl[:-1])
    run_id = np.cumsum(new_run) - 1
    run_starts = np.nonzero(new_run)[0]
    pos = np.arange(fi.shape[0]) - run_starts[run_id]
    slot = pos % NGS
    chunk_first = slot == 0
    cid = np.cumsum(chunk_first) - 1
    n_chunks = int(cid[-1]) + 1
    first = np.nonzero(chunk_first)[0]
    chunk_tile = tl[first]
    n_tiles = -(-n // tile_rows)
    per_tile = np.bincount(chunk_tile, minlength=n_tiles)
    c_max = int(per_tile.max())
    c_max = max(-(-c_max // 8) * 8, 8)
    rank = np.zeros(n_chunks, dtype=np.int64)
    ptr = np.zeros(n_tiles + 1, dtype=np.int64)
    np.cumsum(per_tile, out=ptr[1:])
    order2 = np.argsort(chunk_tile, kind="stable")
    rank[order2] = np.arange(n_chunks) - ptr[chunk_tile[order2]]
    tg = np.zeros((n_tiles, c_max, NGS), dtype=np.int32)
    tm = np.zeros((n_tiles, c_max, NGS), dtype=np.float32)
    tg[chunk_tile[cid], rank[cid], slot] = (fi - tl * tile_rows).astype(np.int32)
    tm[chunk_tile[cid], rank[cid], slot] = fm
    frag = n_chunks / max(c, 1)
    return tg, tm, frag


def run_scale(scale):
    if scale == "tiny":
        n, nnz, f = 1024, 32_768, 32
        tile_rows = 128
    elif scale == "pubmed":
        n, nnz, f = 19_968, 86_016, 64
        tile_rows = 256
    else:
        n, nnz, f = 2_000_000, 9_998_336, 32
        tile_rows = 512
    c = nnz // NGS
    log(f"\n=== scale {scale}: N={n} nnz={nnz} F={f} C={c} ===")
    x, gidx, gmask = build_case(n, nnz, f, seed=0)
    xj = jnp.asarray(x)
    gj = jnp.asarray(gidx)
    mj = jnp.asarray(gmask)
    flat = jnp.asarray(gidx.reshape(-1))

    def want(name):
        return CASES is None or name in CASES

    if scale == "tiny":
        # correctness check of each stage impl vs the numpy oracle
        oracle = (x[gidx.reshape(-1)].reshape(c, NGS, f) * gmask[:, :, None]).sum(1)
        for name, fn in (
            ("pallas_vmem", lambda: pallas_vmem_stage(xj, gj, mj, block_chunks=512)),  # noqa
            ("pallas_dma", lambda: pallas_dma_stage(xj, gj, mj, block_chunks=512, n_buf=4)),
        ):
            try:
                got = np.asarray(fn())
                err = np.abs(got - oracle).max()
                log(f"  verify {name}: max_err={err:.2e}")
            except Exception as e:
                log(f"  verify {name}: FAILED {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:200]}")
        tg, tm, frag = bucket_by_tile(gidx, gmask, n, tile_rows)
        pad = tg.shape[0] * tile_rows - n
        part = np.asarray(
            multihot_stage(jnp.asarray(np.pad(x, ((0, pad), (0, 0)))),
                           jnp.asarray(tg), jnp.asarray(tm), tile_rows)
        )
        # sum of all partials must equal sum of oracle (combine-invariant)
        err = abs(part.sum() - oracle.sum()) / max(abs(oracle.sum()), 1e-9)
        log(f"  verify multihot: rel_total_err={err:.2e} frag={frag:.2f}")

    if want("xla_gather"):
        chain_time("xla_gather      ", lambda xx, ii: jnp.take(xx, ii, axis=0),
                   xj, (flat,))
    if want("xla_sorted"):
        si = jnp.asarray(np.sort(gidx.reshape(-1)))
        chain_time("xla_sorted      ", lambda xx, ii: jnp.take(xx, ii, axis=0),
                   xj, (si,))
    if want("xla_ell"):
        def ell(xx, gg, mm):
            gath = jnp.take(xx, gg.reshape(-1), axis=0).reshape(c, NGS, f)
            return jnp.sum(gath * mm[:, :, None], axis=1)
        chain_time("xla_ell         ", ell, xj, (gj, mj))
    if want("pallas_vmem") and scale == "pubmed":
        chain_time("pallas_vmem     ", lambda xx, gg, mm: pallas_vmem_stage(xx, gg, mm),
                   xj, (gj, mj))
    if want("pallas_dma"):
        for nb in (4, 8, 16):
            chain_time(f"pallas_dma b={nb:<3}",
                       functools.partial(pallas_dma_stage, n_buf=nb, block_chunks=256),
                       xj, (gj, mj))
    if want("multihot"):
        for label, clus in (("rand", 0), ("clus", tile_rows)):
            xc, gc, mc = build_case(n, nnz, f, seed=1, clustered_tile=clus)
            tg, tm, frag = bucket_by_tile(gc, mc, n, tile_rows)
            pad = tg.shape[0] * tile_rows - n
            xcp = np.pad(xc, ((0, pad), (0, 0)))
            log(f"  multihot[{label}]: frag={frag:.2f} c_max={tg.shape[1]} "
                f"tiles={tg.shape[0]}")
            chain_time(
                f"multihot_{label}   ",
                lambda xx, a, b: multihot_stage(xx, a, b, tile_rows),
                jnp.asarray(xcp), (jnp.asarray(tg), jnp.asarray(tm)),
            )


if __name__ == "__main__":
    log(f"devices: {jax.devices()}  interpret={INTERPRET}")
    for s in SCALES:
        run_scale(s)
    log("probe done")
