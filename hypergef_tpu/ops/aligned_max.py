"""Max first-aggregation over the ALIGNED band structure (round-3
mandate #6: aligned-form max within ~2x sum, where round 2 stood at ~5x).

The aligned sum path is gather-free (band matmuls over block-gathered
windows); max cannot ride the MXU (not linear, and the exact VJP needs
the per-(segment, feature) winning vertex — the reference's
record_table, ``hgnnaggr_cuda.cu:144-208``).  Round 2's XLA windowed
masked-max probe was a "~9% near-tie" with the argmax gather tree —
because XLA materializes the [G, W, F] select through HBM.  This Pallas
kernel keeps the band plane [G, W] and the window rows [W, F] VMEM
resident across all F feature passes, so the masked max+argmax runs at
VPU element rate instead of HBM rate.

Semantics parity (same as ops/maxops): value = max over member vertices
in f32; argmax = the FIRST member in CSR (ascending-vertex) order
achieving the max — window rows ascend within a window and spill slots
ascend per group, so "lowest candidate index" = "lowest vertex id".
Band-vs-spill ties resolve by lower vertex id explicitly.  Empty
segments get y=0, arg=-1 (reference zero-init parity).

Backward: identical machinery to ops/maxops._v2e_max_bwd — the arg
table routes cotangents through the vertex-major CSR with a sorted
segment sum (scatter-free, exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypergef_tpu.ops.segments import segment_sum_sorted
from hypergef_tpu.ops.tree import (
    AlignedStageBDev, AlignedStageDev, _ALIGNED_BLOCK)

_NEG = -3.0e38
_BIG = np.int32(2**31 - 1)


def _masked_argmax_kernel(f_dim: int, g_rows: int, w_dim: int):
    """Per grid step (one group): band [G, W] int8 + winT [F, W] f32 ->
    val [G, F] f32, arg-SLOT [G, F] int32 (window slot index of the
    winner; _BIG where no live candidate).  The slot -> global-id map
    happens OUTSIDE the kernel (slot order == ascending vertex id by
    plan construction, so min-slot == first CSR-order winner).

    Mosaic layout notes (this shape is what lowers on real TPU — the
    first cut used [W, F] windows with per-f lane slicing, [1, W] gid
    blocks, and mixed-replication selects, all of which Mosaic
    rejects): candidate rows enter TRANSPOSED [F, W] so the per-feature
    row read is a static sublane index; every replicated operand is
    broadcast to full [G, *] shape BEFORE any select touching the i1
    mask (Mosaic cannot relayout a non-singleton mask to replicated);
    results accumulate in [G, F] registers via a lane-iota select
    instead of lane-scalar stores."""

    def kernel(band_ref, win_ref, val_ref, arg_ref):
        band = band_ref[0]  # [G, W] int8
        live = band != 0  # [G, W] i1, native layout
        # native-layout ({0,0}) zeros: adding them de-replicates every
        # broadcast BEFORE it meets the i1 mask in a select — Mosaic
        # cannot relayout a non-singleton mask to replicated, and a
        # dim-1 iota is itself sublane-replicated, so the zeros must
        # come from genuinely 2-D-varying values (the loaded band;
        # an iota SUM for the [G, F] shape)
        zi_w = jnp.minimum(band.astype(jnp.int32), 0)  # [G, W] zeros
        zf_w = zi_w.astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, f_dim), 1)
        sub_f = jax.lax.broadcasted_iota(jnp.int32, (g_rows, f_dim), 0)
        zi_f = jnp.minimum(lane + sub_f, 0)  # [G, F] zeros, native
        zf_f = zi_f.astype(jnp.float32)
        slot = (jax.lax.broadcasted_iota(jnp.int32, (g_rows, w_dim), 1)
                + zi_w)  # native lane-index plane
        acc_v = jnp.full((g_rows, f_dim), _NEG, jnp.float32) + zf_f
        acc_s = jnp.full((g_rows, f_dim), _BIG, jnp.int32) + zi_f
        for f in range(f_dim):
            row = win_ref[0, f, :]  # [W] (lane vector)
            rowg = row[None, :] + zf_w  # [G, W] native
            cand = jnp.where(live, rowg, _NEG)  # [G, W]
            m = jnp.max(cand, axis=1, keepdims=True)  # [G, 1]
            hit = (cand == (m + zf_w)) & live
            # lowest winning slot == first CSR-order winner
            s_hit = jnp.where(hit, slot, _BIG)  # [G, W]
            s = jnp.min(s_hit, axis=1, keepdims=True)  # [G, 1]
            sel = lane == f
            acc_v = jnp.where(sel, m + zf_f, acc_v)
            acc_s = jnp.where(sel, s + zi_f, acc_s)
        val_ref[0] = acc_v
        arg_ref[0] = acc_s

    return kernel


@functools.partial(jax.jit, static_argnums=(3,), inline=True)
def _masked_argmax_call(band, gids, win, interpret):
    """band [n_groups, G, W] int8; gids [n_groups, W] int32 (global
    source ids per slot, ascending per group); win [n_groups, W, F] f32
    (candidate rows).
    Returns (val [n_groups, G, F], arg [n_groups, G, F])."""
    n_groups, g_rows, w = band.shape
    f = win.shape[2]
    win_t = jnp.swapaxes(win, 1, 2)  # [n_groups, F, W]
    val, slot = pl.pallas_call(
        _masked_argmax_kernel(f, g_rows, w),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, g_rows, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g_rows, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_rows, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, g_rows, f), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, g_rows, f), jnp.int32),
        ],
        interpret=interpret,
    )(band, win_t)
    # slot -> global source id (XLA gather over the output-sized table)
    dead = slot == _BIG
    safe = jnp.where(dead, 0, slot)
    base = (jnp.arange(n_groups, dtype=jnp.int32) * w)[:, None, None]
    arg = jnp.take(gids.reshape(-1), base + safe)
    return val, jnp.where(dead, -1, arg)


def _combine(val_a, arg_a, val_b, arg_b):
    """Merge two candidate sets with the first-CSR-winner tie rule
    (lower vertex id wins equal values; arg == -1 means no candidate)."""
    b_alive = arg_b >= 0
    a_alive = arg_a >= 0
    arg_a_c = jnp.where(a_alive, arg_a, _BIG)
    arg_b_c = jnp.where(b_alive, arg_b, _BIG)
    take_b = b_alive & (
        (val_b > val_a)
        | (~a_alive)
        | ((val_b == val_a) & (arg_b_c < arg_a_c))
    )
    val = jnp.where(take_b, val_b, val_a)
    arg = jnp.where(take_b, arg_b, arg_a)
    return val, arg


def _window_pieces_uniform(x, st: AlignedStageDev, interpret):
    f = x.shape[1]
    n_groups, wb = st.win_block.shape
    blk = _ALIGNED_BLOCK
    pad = (-st.num_inputs) % blk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xb = xp.reshape(-1, blk, f)
    win = jnp.take(xb, st.win_block.reshape(-1), axis=0)
    win = win.reshape(n_groups, wb * blk, f)
    # global source id per window slot; ids >= num_inputs are pad rows —
    # their band columns are zero, so they are never live
    gid = (st.win_block[:, :, None] * blk
           + jnp.arange(blk, dtype=jnp.int32)[None, None, :])
    gid = gid.reshape(n_groups, wb * blk).astype(jnp.int32)
    val, arg = _masked_argmax_call(st.b_dense.astype(jnp.int8), gid,
                                   win, interpret)
    return val, arg


def _spill_pieces(x, spill_src, b_spill, interpret):
    """spill_src [m, sw] int32 (num_inputs = zero row), b_spill
    [m, G, sw] int8 — same kernel, slots padded to a lane multiple."""
    f = x.shape[1]
    m, sw = spill_src.shape
    pad = (-sw) % 128
    if pad:
        spill_src = jnp.pad(spill_src, ((0, 0), (0, pad)))
        b_spill = jnp.pad(b_spill, ((0, 0), (0, 0), (0, pad)))
    xz = jnp.pad(x, ((0, 1), (0, 0)))
    rows = jnp.take(xz, spill_src.reshape(-1), axis=0)
    rows = rows.reshape(m, sw + pad, f)
    return _masked_argmax_call(b_spill.astype(jnp.int8),
                               spill_src.astype(jnp.int32), rows, interpret)


def aligned_max_with_arg(x, st, interpret=None):
    """(y [S, F], arg [S, F]) over an aligned stage (uniform or
    bucketed), record_table semantics."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    f = x.shape[1]
    if isinstance(st, AlignedStageDev):
        val, arg = _window_pieces_uniform(x, st, interpret)
        if st.spill_src.shape[1]:
            sval, sarg = _spill_pieces(x, st.spill_src, st.b_spill,
                                       interpret)
            val, arg = _combine(val, arg, sval, sarg)
        g_rows = st.group_rows
        n_segments = st.num_segments
    elif isinstance(st, AlignedStageBDev):
        blk = st.block_rows
        pad = (-st.num_inputs) % blk
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        xb = xp.reshape(-1, blk, f)
        vals, args = [], []
        for bk in st.buckets:
            ng_b, wb = bk.win_block.shape
            win = jnp.take(xb, bk.win_block.reshape(-1), axis=0)
            win = win.reshape(ng_b, wb * blk, f)
            gid = (bk.win_block[:, :, None] * blk
                   + jnp.arange(blk, dtype=jnp.int32)[None, None, :])
            gid = gid.reshape(ng_b, wb * blk).astype(jnp.int32)
            v, a = _masked_argmax_call(bk.b_dense.astype(jnp.int8), gid,
                                       win, interpret)
            vals.append(v)
            args.append(a)
        cat_v = jnp.concatenate(vals, axis=0) if len(vals) > 1 else vals[0]
        cat_a = jnp.concatenate(args, axis=0) if len(args) > 1 else args[0]
        val = jnp.take(cat_v, st.base_slot, axis=0)
        arg = jnp.take(cat_a, st.base_slot, axis=0)
        if st.spills:
            svals, sargs = [], []
            for sp in st.spills:
                v, a = _spill_pieces(x, sp.spill_src, sp.b_spill, interpret)
                svals.append(v)
                sargs.append(a)
            svals.append(jnp.full((1, st.group_rows, f), _NEG, jnp.float32))
            sargs.append(jnp.full((1, st.group_rows, f), -1, jnp.int32))
            scat_v = jnp.concatenate(svals, axis=0)
            scat_a = jnp.concatenate(sargs, axis=0)
            sval = jnp.take(scat_v, st.spill_slot, axis=0)
            sarg = jnp.take(scat_a, st.spill_slot, axis=0)
            val, arg = _combine(val, arg, sval, sarg)
        g_rows = st.group_rows
        n_segments = st.num_segments
    else:
        raise TypeError(f"aligned_max_with_arg needs an aligned stage, "
                        f"got {type(st).__name__}")
    y = val.reshape(-1, f)[:n_segments]
    a = arg.reshape(-1, f)[:n_segments]
    alive = a >= 0
    return jnp.where(alive, y, 0.0), jnp.where(alive, a, -1)


def _masked_argsum_kernel(f_dim: int, g_rows: int):
    """Backward counterpart of the masked argmax: per grid step (one
    OUTPUT group of the transpose stage), route each segment cotangent
    to its recorded winner:  out[r, f] = sum over live slots w with
    arg[w, f] == global_row(r) of g[w, f]."""

    def kernel(band_ref, garg_ref, gg_ref, out_ref):
        band = band_ref[0]  # [G, W] — transpose-stage band
        w_dim = band.shape[1]
        live = band != 0
        base = pl.program_id(0) * g_rows
        vids = base + jax.lax.broadcasted_iota(
            jnp.int32, (g_rows, w_dim), 0)  # [G, W] global output row ids
        lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, f_dim), 1)
        # native-layout zeros — see _masked_argmax_kernel layout notes
        zi_w = jnp.minimum(band.astype(jnp.int32), 0)  # [G, W] native
        zf_w = zi_w.astype(jnp.float32)
        sub_f = jax.lax.broadcasted_iota(jnp.int32, (g_rows, f_dim), 0)
        zf_f = jnp.minimum(lane + sub_f, 0).astype(jnp.float32)
        acc = jnp.zeros((g_rows, f_dim), jnp.float32) + zf_f
        for f in range(f_dim):
            ga = garg_ref[0, f, :]  # [W] (transposed input, lane vector)
            gv = gg_ref[0, f, :]  # [W]
            hit = live & ((ga[None, :] + zi_w) == vids)
            s = jnp.sum(jnp.where(hit, gv[None, :] + zf_w, 0.0), axis=1,
                        keepdims=True)  # [G, 1]
            acc = jnp.where(lane == f, s + zf_f, acc)
        out_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnums=(3,), inline=True)
def _masked_argsum_call(band, garg, gg, interpret):
    n_groups, g_rows, w = band.shape
    f = gg.shape[2]
    garg_t = jnp.swapaxes(garg, 1, 2)  # [n_groups, F, W]
    gg_t = jnp.swapaxes(gg, 1, 2)
    return pl.pallas_call(
        _masked_argsum_kernel(f, g_rows),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, g_rows, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g_rows, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups, g_rows, f), jnp.float32),
        interpret=interpret,
    )(band, garg_t, gg_t)


def _argsum_apply(g, arg, st: AlignedStageDev, interpret=None):
    """dx = record-routed cotangents over the TRANSPOSE aligned stage
    ``st`` (maps segments → inputs): dx[v, f] = Σ_{e: arg[e,f]==v} g[e,f].
    Exact (the indicator is exact); no CSR arrays needed — the aligned
    transpose structure localizes each vertex's candidate edges to its
    window + spill slots, the same locality the forward uses."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not isinstance(st, AlignedStageDev):
        raise TypeError("aligned max transpose backward needs a uniform "
                        "AlignedStageDev (halo interiors)")
    f = g.shape[1]
    n_groups, wb = st.win_block.shape
    blk = _ALIGNED_BLOCK
    # pad segment-side arrays to the block-index space of the transpose
    # stage's windows (num_inputs here = number of segments of the fwd)
    pad = (-st.num_inputs) % blk
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    argp = jnp.pad(arg, ((0, pad), (0, 0)), constant_values=-1)
    gb = gp.reshape(-1, blk, f)
    ab = argp.reshape(-1, blk, f)
    gwin = jnp.take(gb, st.win_block.reshape(-1), axis=0)
    gwin = gwin.reshape(n_groups, wb * blk, f)
    awin = jnp.take(ab, st.win_block.reshape(-1), axis=0)
    awin = awin.reshape(n_groups, wb * blk, f)
    dx = _masked_argsum_call(st.b_dense.astype(jnp.int8), awin, gwin,
                             interpret)
    spill_w = st.spill_src.shape[1]
    if spill_w:
        pad_s = (-spill_w) % 128
        ss = st.spill_src
        bs = st.b_spill
        if pad_s:
            ss = jnp.pad(ss, ((0, 0), (0, pad_s)))
            bs = jnp.pad(bs, ((0, 0), (0, 0), (0, pad_s)))
        gz = jnp.pad(g, ((0, 1), (0, 0)))
        az = jnp.pad(arg, ((0, 1), (0, 0)), constant_values=-1)
        grows = jnp.take(gz, ss.reshape(-1), axis=0)
        grows = grows.reshape(n_groups, spill_w + pad_s, f)
        arows = jnp.take(az, ss.reshape(-1), axis=0)
        arows = arows.reshape(n_groups, spill_w + pad_s, f)
        dx = dx + _masked_argsum_call(bs.astype(jnp.int8), arows, grows,
                                      interpret)
    return dx.reshape(-1, f)[: st.num_segments]


@jax.custom_vjp
def aligned_max_matvec(x, fwd_stage, bwd_stage):
    """y[s, f] = max over the fwd aligned stage, with the exact
    record-routed VJP expressed over the TRANSPOSE aligned stage —
    no CSR arrays needed (the halo interior form)."""
    y, _ = aligned_max_with_arg(x, fwd_stage)
    return y


def _amm_fwd(x, fwd_stage, bwd_stage):
    y, arg = aligned_max_with_arg(x, fwd_stage)
    return y, (arg, bwd_stage)


def _amm_bwd(res, g):
    arg, bwd_stage = res
    return _argsum_apply(g, arg, bwd_stage), None, None


aligned_max_matvec.defvjp(_amm_fwd, _amm_bwd)


@jax.custom_vjp
def v2e_max_aligned(x, e_stage, h_edge, h_segids, h_indptr):
    """``y[e, f] = max_{v in e} x[v, f]`` over an ALIGNED stage, exact
    record-table VJP (the aligned counterpart of
    :func:`hypergef_tpu.ops.maxops.v2e_max_tree`)."""
    y, _ = aligned_max_with_arg(x, e_stage)
    return y


def _fwd(x, e_stage, h_edge, h_segids, h_indptr):
    y, arg = aligned_max_with_arg(x, e_stage)
    return y, (arg, h_edge, h_segids, h_indptr)


def _bwd(res, g):
    arg, h_edge, h_segids, h_indptr = res
    gg = jnp.take(g, h_edge, axis=0)
    ga = jnp.take(arg, h_edge, axis=0)
    w = (ga == h_segids[:, None]).astype(g.dtype)
    dx = segment_sum_sorted(gg * w, h_indptr)
    return dx, None, None, None, None


v2e_max_aligned.defvjp(_fwd, _bwd)
