"""Fused Pallas band kernel for the aligned (sum) stage — round-5
mandate #3: cut the per-XLA-kernel fixed-cost multiplier.

The XLA form of one aligned band bucket is a chain of separate kernels
(window block-gather → band dot → spill row-gather → spill dot → add),
each paying the measured ~4.4 µs dispatch/fixed cost
(small_floor_r4.txt) — 25–41% of the whole layer at mid-size.  This
kernel fuses a bucket into ONE program:

* the window "gather" disappears into the grid pipeline: the x block
  for grid step (g, k) is selected by a scalar-prefetched
  ``win_block`` index map, so the Pallas pipeline DMAs exactly the
  window blocks the group needs — no materialized [ng, W, F] windows
  in HBM at all (the XLA form streams them out and back);
* the band dot accumulates in a VMEM-resident [G, F] output block
  across the k (window block) grid dimension;
* the spill contribution (rows pre-gathered by XLA's gather engine —
  the one machine that does 8 ns/row random access) is added by a
  second small dot on the last k step, in the same program.

The f32→bf16 conversion of x happens in-kernel (VPU), removing the
shared cast kernel the XLA form needs.  Semantics are identical to
``ops.tree._apply_aligned_b`` (same tables, same math); parity is
asserted by tests/test_aligned_pallas.py against the XLA form and the
nnz oracle.  Reference: the whole two-stage layer is ONE kernel in the
reference (``hgnnaggr_cuda.cu:14-47``) — this restores that design
essence on the TPU side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_kernel(has_spill: bool, g_rows: int, block_rows: int, f_dim: int):
    """One grid step = (group g, window block k): accumulate
    ``b_dense[g][:, k·B:(k+1)·B] @ x[win_block[g,k]]`` into out[g];
    on the last k also add the spill dot."""

    if has_spill:
        def kernel(wb_ref, band_ref, xblk_ref, bspill_ref, srows_ref,
                   out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[0] = jnp.zeros((g_rows, f_dim), jnp.float32)

            band = band_ref[0].astype(jnp.bfloat16)  # [G, B] int8→bf16
            xb = xblk_ref[0].astype(jnp.bfloat16)  # [B, F] f32→bf16
            out_ref[0] += jnp.dot(band, xb,
                                  preferred_element_type=jnp.float32)

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                bs = bspill_ref[0].astype(jnp.bfloat16)  # [G, sw]
                sr = srows_ref[0].astype(jnp.bfloat16)  # [sw, F]
                out_ref[0] += jnp.dot(bs, sr,
                                      preferred_element_type=jnp.float32)
    else:
        def kernel(wb_ref, band_ref, xblk_ref, out_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                out_ref[0] = jnp.zeros((g_rows, f_dim), jnp.float32)

            band = band_ref[0].astype(jnp.bfloat16)
            xb = xblk_ref[0].astype(jnp.bfloat16)
            out_ref[0] += jnp.dot(band, xb,
                                  preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnums=(5,), inline=True)
def _band_bucket_call(win_block, b_dense, xb, b_spill, spill_rows,
                      interpret):
    """One fused band bucket.

    win_block [ng, wb] int32 (block ids into xb); b_dense [ng, G, wb·B]
    int8; xb [nb, B, F] f32 (block-reshaped padded x); b_spill
    [ng, G, sw] int8 or None; spill_rows [ng, sw, F] f32 or None.
    Returns [ng, G, F] f32.
    """
    ng, wb = win_block.shape
    g_rows = b_dense.shape[1]
    block_rows = xb.shape[1]
    f = xb.shape[2]
    has_spill = b_spill is not None
    wflat = win_block.reshape(-1)

    in_specs = [
        # b_dense: one [G, B] band slab per (g, k)
        pl.BlockSpec((1, g_rows, block_rows), lambda g, k, wref: (g, 0, k),
                     memory_space=pltpu.VMEM),
        # x block selected by the scalar-prefetched window table — the
        # pipeline DMA IS the gather
        pl.BlockSpec((1, block_rows, f),
                     lambda g, k, wref: (wref[g * wb + k], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [b_dense, xb]
    if has_spill:
        sw = b_spill.shape[2]
        in_specs += [
            pl.BlockSpec((1, g_rows, sw), lambda g, k, wref: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sw, f), lambda g, k, wref: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [b_spill, spill_rows]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng, wb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g_rows, f), lambda g, k, wref: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _band_kernel(has_spill, g_rows, block_rows, f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, g_rows, f), jnp.float32),
        interpret=interpret,
    )(wflat, *args)


def _pad_lane(a, axis, mult=128):
    """Pad ``axis`` of ``a`` up to a multiple of ``mult`` with zeros."""
    size = a.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def apply_aligned_b_pallas(x, st, interpret=None):
    """Pallas form of :func:`hypergef_tpu.ops.tree._apply_aligned_b` —
    same tables, same result, ~2 kernels per stage instead of ~5-6."""
    from hypergef_tpu.ops.tree import AlignedStageBDev

    assert isinstance(st, AlignedStageBDev)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f = x.shape[1]
    blk = st.block_rows
    pad = (-st.num_inputs) % blk
    xb = jnp.pad(x, ((0, pad), (0, 0)))  # f32; bf16 cast happens in-kernel
    xb = xb.reshape(-1, blk, f)  # [nb, B, F]

    # spill rows per group, gathered flat by XLA's gather engine (the
    # 8 ns/row machine — in-kernel per-row DMA cannot match it), then
    # block-shaped for the kernel's per-group spill slab
    spill_of_bucket = {}
    if st.spills:
        xz = jnp.pad(x, ((0, 1), (0, 0)))  # zero row at num_inputs
        for bi, sp in enumerate(st.spills):
            m_b, sw = sp.spill_src.shape
            rows = jnp.take(xz, sp.spill_src.reshape(-1), axis=0)
            rows = rows.reshape(m_b, sw, f)
            # lane-align the contraction dim for the MXU
            bs = _pad_lane(sp.b_spill, axis=2)
            rows = _pad_lane(rows, axis=1)
            spill_of_bucket[bi] = (bs, rows)

    # one fused kernel per band bucket; with the cost-aware merge this
    # is 1 (sometimes 2) per stage.  Spill buckets pair 1:1 with band
    # buckets only in the single-bucket case; otherwise spill is applied
    # through the generic slot map below.
    single = len(st.buckets) == 1 and len(st.spills) <= 1
    outs = []
    for i, bk in enumerate(st.buckets):
        bs = rows = None
        if single and st.spill_identity and 0 in spill_of_bucket:
            bs, rows = spill_of_bucket[0]
        outs.append(_band_bucket_call(bk.win_block, bk.b_dense, xb,
                                      bs, rows, interpret))
    cat = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    base = cat if st.base_identity else jnp.take(cat, st.base_slot, axis=0)

    # spill not folded into the kernel (multi-bucket / non-identity):
    # fall back to the XLA-form spill path
    if st.spills and not (single and st.spill_identity):
        souts = []
        for bi, sp in enumerate(st.spills):
            bs, rows = spill_of_bucket[bi]
            souts.append(jax.lax.dot_general(
                bs.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
        if st.spill_identity:
            base = base + souts[0]
        else:
            souts.append(jnp.zeros((1, st.group_rows, f), jnp.float32))
            scat = jnp.concatenate(souts, axis=0)
            base = base + jnp.take(scat, st.spill_slot, axis=0)
    return base.reshape(-1, f)[: st.num_segments]
