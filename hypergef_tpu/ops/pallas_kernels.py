"""Pallas TPU kernels: the fully-fused dense two-stage aggregation.

Scope (informed by the Mosaic capability probes, docs/KERNEL_NOTES.md):
vectorized in-kernel gathers are not available on this toolchain, so the
*sparse* formulations are best served by XLA's native gather (tree/bsr
backends).  What Pallas uniquely buys is **true two-stage fusion for the
dense-MXU path**: one kernel computes

    out = degV ⊙ ( H @ ( (degE·Wdiag) ⊙ (Hᵀ @ X) ) )

with the intermediate Xe ([E, F]) living entirely in VMEM scratch —
never touching HBM — and both matmuls on the MXU.  H is streamed in
bf16 and read exactly twice (the unavoidable minimum for the two-sided
product); the elementwise scalings ride along for free.  This is the
TPU analogue of the reference's single fused CUDA kernel
(``hgnnaggr_cuda.cu:14-47``): one launch, no materialized intermediates.

Used for graphs whose Xe fits VMEM (the dispatcher's ``pallas`` backend
raises for larger graphs — use bsr/tree there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypergef_tpu.sparse.planner import DenseIncidence

_LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=(1, 2, 3), inline=True)
def _unpack_bf16(h, n, e, packed):
    if packed:  # int8 nibble carrier → S4 [N, E] (trace-only; see planner)
        # pre-barrier: XLA mis-constant-folds S4 bitcasts of closure
        # constants; post-barrier: the fused bitcast→dot form is 10×
        # slow — materialize the S4 table (see ops/fused._dense_dot)
        h = jax.lax.optimization_barrier(h)
        h = jax.lax.bitcast_convert_type(h, jnp.int4).reshape(n, -1)
        h = jax.lax.optimization_barrier(h)[:, :e]
    return h.astype(jnp.bfloat16)


def _dense_bf16(dense: DenseIncidence):
    """Materialize the bf16 [N, E] table from any DenseIncidence storage."""
    return _unpack_bf16(dense.h, dense.num_nodes, dense.num_edges,
                        getattr(dense, "packed", False))


def fused_dense_two_stage(h_bf16, x, scale_e, scale_v, *, interpret=False,
                          e_tile=256, n_tile=256):
    """out = scale_v ⊙ (H @ (scale_e ⊙ (Hᵀ @ X))).

    h_bf16: [N, E] bf16; x: [N, F] f32; scale_e: [E, 1]; scale_v: [N, 1].
    One pallas_call with a phased sequential grid: the first
    ``E/e_tile`` steps compute Xe tiles into a VMEM scratch accumulator,
    the remaining ``N/n_tile`` steps compute output tiles from it.  The
    Xe intermediate never reaches HBM.
    """
    n, e = h_bf16.shape
    f = x.shape[1]
    n_pad = _round_up(n, n_tile)
    e_pad = _round_up(e, e_tile)
    f_pad = _round_up(f, _LANE)
    h_p = jnp.pad(h_bf16, ((0, n_pad - n), (0, e_pad - e)))
    x_p = jnp.pad(x, ((0, n_pad - n), (0, f_pad - f)))
    # scales as [*, LANE] VMEM inputs (lane-aligned; kernel uses col 0)
    se = jnp.broadcast_to(
        jnp.pad(scale_e, ((0, e_pad - e), (0, 0))), (e_pad, _LANE)
    )
    sv = jnp.broadcast_to(
        jnp.pad(scale_v, ((0, n_pad - n), (0, 0))), (n_pad, _LANE)
    )
    t_e = e_pad // e_tile
    t_n = n_pad // n_tile

    def kernel(ht_ref, h_ref, x_ref, se_ref, sv_ref, o_ref, xe_ref):
        i = pl.program_id(0)

        @pl.when(i < t_e)
        def _():
            # (Hᵀ tile) @ X: contract vertex dim of the [n_pad, e_tile]
            # column block with X [n_pad, f_pad]
            acc = jax.lax.dot_general(
                ht_ref[:], x_ref[:].astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [e_tile, f_pad]
            xe_ref[pl.ds(i * e_tile, e_tile), :] = acc * se_ref[:, :1]

        @pl.when(i >= t_e)
        def _():
            acc = jax.lax.dot_general(
                h_ref[:], xe_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [n_tile, f_pad]
            o_ref[:] = acc * sv_ref[:, :1]

    out = pl.pallas_call(
        kernel,
        grid=(t_e + t_n,),
        in_specs=[
            pl.BlockSpec(  # Hᵀ use: column block [n_pad, e_tile]
                (n_pad, e_tile),
                lambda i: (0, jnp.minimum(i, t_e - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # H use: row block [n_tile, e_pad]
                (n_tile, e_pad),
                lambda i: (jnp.maximum(i - t_e, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (e_tile, _LANE), lambda i: (jnp.minimum(i, t_e - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_tile, _LANE), lambda i: (jnp.maximum(i - t_e, 0), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_tile, f_pad), lambda i: (jnp.maximum(i - t_e, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((e_pad, f_pad), jnp.float32)],
        interpret=interpret,
    )(h_p, h_p, x_p, se.astype(jnp.float32), sv.astype(jnp.float32))
    return out[:n, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_dense_op(h_bf16, x, scale_e, scale_v, interpret):
    return fused_dense_two_stage(h_bf16, x, scale_e, scale_v, interpret=interpret)


def _fd_fwd(h_bf16, x, scale_e, scale_v, interpret):
    y = fused_dense_two_stage(h_bf16, x, scale_e, scale_v, interpret=interpret)
    return y, (h_bf16, x, scale_e, scale_v)


def _fd_bwd(interpret, res, g):
    h_bf16, x, scale_e, scale_v = res
    # adjoint of out = Sv H Se Hᵀ x:  dx = H Se Hᵀ (Sv ⊙ g) — the same
    # fused kernel with the output scaling moved to the input side.
    gv = g * scale_v
    dx = fused_dense_two_stage(
        h_bf16, gv, scale_e, jnp.ones_like(scale_v), interpret=interpret
    )
    # d scale_e[e] = Σ_f (Hᵀ x)[e,f] · (Hᵀ (Sv g))[e,f]
    ht_x = jax.lax.dot_general(
        h_bf16, x.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ht_svg = jax.lax.dot_general(
        h_bf16, gv.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_se = jnp.sum(ht_x * ht_svg, axis=1, keepdims=True)
    # d scale_v[v] = Σ_f (H Se Hᵀ x)[v,f] · g[v,f]
    y_unscaled = fused_dense_two_stage(
        h_bf16, x, scale_e, jnp.ones_like(scale_v), interpret=interpret
    )
    d_sv = jnp.sum(y_unscaled * g, axis=1, keepdims=True)
    # H is a constant incidence buffer; its cotangent is pruned by DCE.
    return jnp.zeros_like(h_bf16), dx, d_se, d_sv


_fused_dense_op.defvjp(_fd_fwd, _fd_bwd)


VMEM_XE_BUDGET = 4 * 1024 * 1024  # bytes for the Xe scratch
VMEM_TOTAL_BUDGET = 11 * 1024 * 1024  # all kernel buffers (16MB VMEM - slack)


def _vmem_bytes(n, e, f, e_tile=256, n_tile=256):
    """Upper bound of the kernel's resident VMEM buffers."""
    n_pad = _round_up(n, n_tile)
    e_pad = _round_up(e, e_tile)
    f_pad = _round_up(f, _LANE)
    return (
        n_pad * e_tile * 2  # Hᵀ column block (bf16)
        + n_tile * e_pad * 2  # H row block (bf16)
        + n_pad * f_pad * 4  # X
        + e_pad * f_pad * 4  # Xe scratch
        + n_tile * f_pad * 4  # out tile
        + (e_tile + n_tile) * _LANE * 4  # scales
    )


def hgnn_aggregate_pallas(hgd, x, wdiag, first_aggr, plan, interpret=False):
    """``pallas`` backend entry: fused dense two-stage kernel.

    ``mean`` first-aggregation folds 1/|e| into the edge-side scale (the
    kernel computes sums; mean = sum ⊙ 1/cnt ⊙ degE ⊙ Wdiag).
    """
    if first_aggr not in ("sum", "mean"):
        raise ValueError("pallas backend implements first_aggr in {sum, mean} "
                         "(max routes to the nnz oracle path)")
    dense = getattr(plan, "dense", None) or plan
    if not isinstance(dense, DenseIncidence):
        raise ValueError("pallas backend needs a plan with a DenseIncidence "
                         "(plan_aggregation builds one for small graphs)")
    e = dense.num_edges
    f = x.shape[1]
    if e * _round_up(f, _LANE) * 4 > VMEM_XE_BUDGET:
        raise ValueError(
            f"Xe ({e}x{f}) exceeds the VMEM scratch budget; use bsr/tree"
        )
    if _vmem_bytes(dense.num_nodes, e, f) > VMEM_TOTAL_BUDGET:
        raise ValueError(
            "fused dense kernel buffers exceed VMEM for this (N, E, F); "
            "dense backend handles this shape"
        )
    scale_e = hgd.degE if wdiag is None else hgd.degE * wdiag
    if first_aggr == "mean":
        cnt = (hgd.ht_indptr[1:] - hgd.ht_indptr[:-1]).astype(x.dtype)[:, None]
        scale_e = scale_e / jnp.maximum(cnt, 1.0)
    interpret = interpret or jax.default_backend() == "cpu"
    # DenseIncidence stores packed int4 / int8 (round 2); the Pallas
    # kernel consumes real bf16 blocks, so materialize the cast here
    # (explicit backend only — the auto ladder routes to the XLA dense
    # path instead)
    return _fused_dense_op(
        _dense_bf16(dense), x, scale_e, hgd.degV, interpret)


def unignn_aggregate_pallas(hgd, x, use_deg, plan, interpret=False):
    dense = getattr(plan, "dense", None) or plan
    if not isinstance(dense, DenseIncidence):
        raise ValueError("pallas backend needs a plan with a DenseIncidence")
    if _vmem_bytes(dense.num_nodes, dense.num_edges, x.shape[1]) > VMEM_TOTAL_BUDGET:
        raise ValueError(
            "fused dense kernel buffers exceed VMEM for this (N, E, F); "
            "dense backend handles this shape"
        )
    ones_e = jnp.ones((dense.num_edges, 1), x.dtype)
    ones_v = jnp.ones((dense.num_nodes, 1), x.dtype)
    scale_e = hgd.degE if use_deg else ones_e
    scale_v = hgd.degV if use_deg else ones_v
    interpret = interpret or jax.default_backend() == "cpu"
    return _fused_dense_op(
        _dense_bf16(dense), x, scale_e, scale_v, interpret)
