"""Fast ``max`` first-aggregation on the reduction-tree path.

The reference implements max with dedicated forward/backward kernels that
record, per (hyperedge, feature), which member vertex won the max
(``record_table``, ``source/hgnnaggr/hgnnaggr_cuda.cu:144-208``;
backward ``hgnnaggr.cc:93-120`` routes each cotangent to exactly that
member).  Round 1 routed every max call to the slow nnz oracle path
(``ops/refops.py``); this module is the fast TPU counterpart:

* **forward** — the same fixed-fan reduction tree the sum path uses
  (:mod:`hypergef_tpu.ops.tree`), with dead slots masked to ``-inf`` and
  an argmax table carried level by level.  The carried value is the
  *source vertex id* (seeded from the level-0 gather table itself), so
  the final table is exactly the reference's record_table semantics:
  ``arg[e, f] = first CSR-order vertex achieving max_{v∈e} x[v, f]``.
  Everything is dense gather/compare/select — no scatter, no
  ``segment_max``.
* **backward** — scatter-free and exact: with the record table in hand,
  ``dx[v, f] = Σ_{e ∋ v} ḡ[e, f] · [arg[e, f] == v]`` is an
  entry-weighted gather + sorted segment sum over the vertex-major CSR —
  the identical data movement as the sum path's backward (one extra
  gathered operand and a compare), so max costs ~2× sum, not the
  oracle's scatter-bound path.

Tie-breaking matches the reference's strict ``>`` update (first maximal
member in CSR order): level-0 ``argmax`` picks the first slot, deeper
levels pick the first chunk, and chunk order is CSR order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypergef_tpu.ops.segments import segment_sum_sorted

_NEG = -3.0e38  # effectively -inf in f32, safe to negate/compare


def _level_max(vals, args, g, m):
    """One fan-in max level: returns (new_vals, new_args).

    vals: [P, F] current partial maxima; args: [P, F] int32 source rows;
    g: [C, fan] gather table over P; m: [C, fan] live mask.
    """
    c, fan = g.shape
    f = vals.shape[1]
    cand = jnp.take(vals, g.reshape(-1), axis=0).reshape(c, fan, f)
    cand = jnp.where(m[:, :, None] > 0, cand, _NEG)
    k_star = jnp.argmax(cand, axis=1)  # [C, F] — first max slot
    new_vals = jnp.max(cand, axis=1)
    carg = jnp.take(args, g.reshape(-1), axis=0).reshape(c, fan, f)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (c, fan, f), 1)
    onehot = k_iota == k_star[:, None, :]
    new_args = jnp.sum(jnp.where(onehot, carg, 0), axis=1)
    return new_vals, new_args


def tree_max_with_arg(x, stage):
    """Max-reduce ``x`` over a tree stage; returns (y [S,F], arg [S,F]).

    ``stage`` is the device 4-tuple from ``TreePlan.device()`` (levels,
    final_idx, final_mask, counts).  Level 0 seeds args from the gather
    table (source row ids); empty segments get y=0, arg=-1.
    """
    levels, final_idx, final_mask, _ = stage
    g0, m0 = levels[0]
    c, ngs = g0.shape
    f = x.shape[1]
    cand = jnp.take(x, g0.reshape(-1), axis=0).reshape(c, ngs, f)
    cand = jnp.where(m0[:, :, None] > 0, cand, _NEG)
    k_star = jnp.argmax(cand, axis=1)
    vals = jnp.max(cand, axis=1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (c, ngs, f), 1)
    onehot = k_iota == k_star[:, None, :]
    args = jnp.sum(jnp.where(onehot, g0[:, :, None], 0), axis=1)
    for g, m in levels[1:]:
        vals, args = _level_max(vals, args, g, m)
    y = jnp.take(vals, final_idx, axis=0)
    arg = jnp.take(args, final_idx, axis=0)
    alive = final_mask[:, None] > 0
    # empty segments → 0 like the reference's zero-initialized output;
    # all-(-inf) rows can only arise from empty segments (every real
    # chunk has ≥1 live slot), so the mask is the complete guard.
    y = jnp.where(alive, y, 0.0)
    arg = jnp.where(alive, arg, -1)
    return y, arg


@jax.custom_vjp
def v2e_max_tree(x, e_stage, h_edge, h_segids, h_indptr):
    """``y[e, f] = max_{v ∈ e} x[v, f]`` over the edge tree stage.

    ``h_edge/h_segids/h_indptr`` is the vertex-major CSR of H, used only
    by the backward (record-table routed cotangents).
    """
    y, _ = tree_max_with_arg(x, e_stage)
    return y


def _v2e_max_fwd(x, e_stage, h_edge, h_segids, h_indptr):
    y, arg = tree_max_with_arg(x, e_stage)
    return y, (arg, h_edge, h_segids, h_indptr)


def _v2e_max_bwd(res, g):
    arg, h_edge, h_segids, h_indptr = res
    gg = jnp.take(g, h_edge, axis=0)  # [nnz, F] cotangents of owning edges
    ga = jnp.take(arg, h_edge, axis=0)  # [nnz, F] winning vertex per (e,f)
    w = (ga == h_segids[:, None]).astype(g.dtype)
    dx = segment_sum_sorted(gg * w, h_indptr)
    return dx, None, None, None, None


v2e_max_tree.defvjp(_v2e_max_fwd, _v2e_max_bwd)
