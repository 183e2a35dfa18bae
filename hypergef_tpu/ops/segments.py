"""Scatter-free sorted segment reductions.

XLA's scatter-add (what ``jax.ops.segment_sum`` lowers to) is both slow
to compile and serialized at runtime on TPU.  Because the hypergraph
layer keeps nnz in CSR order for *both* aggregation directions, every
segment reduction here sees sorted segment ids with known boundaries
(the CSR indptr) — which admits a fully vectorized formulation:

    C    = exclusive-cumsum(vals, axis=0)            # log-depth scan
    y[s] = C[indptr[s+1]] - C[indptr[s]]             # two row gathers

No scatters anywhere; everything is VPU-vectorizable dense work plus row
gathers.  This is the TPU replacement for the role atomics play in the
reference's fused kernel (``hgnnaggr_cuda.cu:14-47``): combination of
per-chunk partials without write conflicts.

Numerical note: f32 cumsum on TPU is a log-tree scan, error O(log nnz ·
eps · running magnitude); for very large nnz the accumulation is done in
f32 with values typically O(row-degree) — acceptable for GNN workloads
and validated against the scatter oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_sorted(vals: jax.Array, indptr: jax.Array) -> jax.Array:
    """Sum ``vals`` within segments delimited by ``indptr``.

    vals: [nnz, F] in segment order; indptr: [S+1] int32 with
    indptr[0]==0, indptr[S]==nnz.  Returns [S, F].
    """
    csum = jnp.cumsum(vals, axis=0, dtype=vals.dtype)
    padded = jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)  # [nnz+1, F]
    return jnp.take(padded, indptr[1:], axis=0) - jnp.take(padded, indptr[:-1], axis=0)


def segment_mean_sorted(vals: jax.Array, indptr: jax.Array) -> jax.Array:
    s = segment_sum_sorted(vals, indptr)
    cnt = (indptr[1:] - indptr[:-1]).astype(vals.dtype)
    return s / jnp.maximum(cnt, 1.0)[:, None]


def gather_segment_sum_sorted(
    x: jax.Array, gather_ids: jax.Array, indptr: jax.Array
) -> jax.Array:
    """Fused gather + sorted segment sum: y[s] = Σ_{k ∈ seg s} x[gather_ids[k]]."""
    return segment_sum_sorted(jnp.take(x, gather_ids, axis=0), indptr)


@jax.custom_vjp
def incidence_gather_sum(x, g_fwd, p_fwd, g_bwd, p_bwd):
    """Incidence-matrix product ``y = M x`` as gather + sorted segment sum,
    with a scatter-free adjoint.

    ``(g_fwd, p_fwd)`` is the CSR of M (rows = output segments) in the
    gather formulation; ``(g_bwd, p_bwd)`` is the CSR of Mᵀ.  Because M
    is a 0/1 incidence matrix, the VJP ``dx = Mᵀ ȳ`` is *the same op*
    with the index sets swapped — the transpose-of-gather scatter that
    plain autodiff would emit (and that XLA compiles/runs poorly on TPU)
    never appears, in forward or backward, to any differentiation order.
    """
    return segment_sum_sorted(jnp.take(x, g_fwd, axis=0), p_fwd)


def _igs_fwd(x, g_fwd, p_fwd, g_bwd, p_bwd):
    return incidence_gather_sum(x, g_fwd, p_fwd, g_bwd, p_bwd), (
        g_fwd,
        p_fwd,
        g_bwd,
        p_bwd,
    )


def _igs_bwd(res, g):
    g_fwd, p_fwd, g_bwd, p_bwd = res
    dx = incidence_gather_sum(g, g_bwd, p_bwd, g_fwd, p_fwd)
    return dx, None, None, None, None


incidence_gather_sum.defvjp(_igs_fwd, _igs_bwd)
