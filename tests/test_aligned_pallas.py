"""Parity tests for the fused Pallas aligned apply (round-5 mandate #3).

The Pallas form (``ops/aligned_pallas``) must be numerically identical
to the XLA kernel-chain form (``ops/tree._apply_aligned_b``) — same
tables, same bf16 dot math — and both match the f32 nnz oracle at bf16
tolerance.  On CPU the kernel runs in interpret mode; the on-chip
Mosaic lowering is exercised by the bench/fig7 drivers.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hypergef_tpu.ops import refops  # noqa: E402
from hypergef_tpu.ops.aligned_pallas import apply_aligned_b_pallas  # noqa: E402
from hypergef_tpu.ops.tree import _apply_aligned_b  # noqa: E402
from hypergef_tpu.sparse.planner import plan_aligned  # noqa: E402


def _graph(n=2000, e=1600, comm=25, avg=5, seed=3):
    """Community-sorted hypergraph (same recipe as test_aligned.py)."""
    from hypergef_tpu.sparse.hypergraph import Hypergraph
    from hypergef_tpu.sparse.reorder import apply_vertex_order

    rng = np.random.default_rng(seed)
    comm_of = np.sort(rng.integers(0, comm, size=n))
    starts = np.searchsorted(comm_of, np.arange(comm))
    ends = np.searchsorted(comm_of, np.arange(comm), side="right")
    vs, es = [], []
    for ei in range(e):
        c = rng.integers(0, comm)
        lo, hi = starts[c], ends[c]
        if hi - lo < 2:
            lo, hi = 0, n
        k = max(int(rng.poisson(avg)), 2)
        members = np.unique(rng.integers(lo, hi, size=k))
        vs.append(members)
        es.append(np.full(len(members), ei, dtype=np.int64))
    hg = Hypergraph.from_coo(np.concatenate(vs), np.concatenate(es),
                             num_nodes=n, num_edges=e)
    hg, _ = apply_vertex_order(hg, np.arange(n), sort_edges=True)
    return hg


@pytest.fixture(scope="module")
def aligned_plan():
    hg = _graph()
    plan = plan_aligned(hg)
    return hg, plan


def test_pallas_matches_xla_form(aligned_plan):
    """Bit-for-bit agreement with the XLA kernel-chain form (identical
    tables and dot dtypes; only the kernel packaging differs)."""
    hg, plan = aligned_plan
    e_stage, v_stage = plan.device()
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(hg.num_nodes, 32)).astype(np.float32))
    ref = _apply_aligned_b(x, e_stage)
    out = apply_aligned_b_pallas(x, e_stage, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    xe = jnp.asarray(np.random.default_rng(4).normal(
        size=(hg.num_edges, 32)).astype(np.float32))
    ref_v = _apply_aligned_b(xe, v_stage)
    out_v = apply_aligned_b_pallas(xe, v_stage, interpret=True)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               rtol=1e-6, atol=1e-6)


def test_pallas_layer_vs_oracle(aligned_plan, monkeypatch):
    """Full HGNN layer through the env switch vs the f32 nnz oracle."""
    from hypergef_tpu.ops import fused

    hg, plan = aligned_plan
    monkeypatch.setenv("HYPERGEF_ALIGNED_PALLAS", "1")
    hgd = hg.device_data()
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(hg.num_nodes, 32)).astype(np.float32))
    y = fused.hgnn_aggregate(hgd, x, None, "sum", plan=plan,
                             backend="aligned")
    yr = refops.hgnn_aggregate_ref(hgd, x, None, "sum")
    scale = float(jnp.max(jnp.abs(yr)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=6e-3 * scale)


def test_pallas_gradient_exact_vjp(aligned_plan, monkeypatch):
    """Gradients ride tree_matvec's stage-swap VJP — the backward is the
    transpose stage's Pallas kernel, matching the oracle's grad."""
    from hypergef_tpu.ops import fused

    hg, plan = aligned_plan
    monkeypatch.setenv("HYPERGEF_ALIGNED_PALLAS", "1")
    hgd = hg.device_data()
    x = jnp.asarray(np.random.default_rng(6).normal(
        size=(hg.num_nodes, 16)).astype(np.float32))

    def f(a):
        return fused.hgnn_aggregate(hgd, a, None, "sum", plan=plan,
                                    backend="aligned").sum()

    def fr(a):
        return refops.hgnn_aggregate_ref(hgd, a, None, "sum").sum()

    g = jax.grad(f)(x)
    gr = jax.grad(fr)(x)
    scale = float(jnp.max(jnp.abs(gr)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=6e-3 * scale)


def test_pallas_under_jit(aligned_plan, monkeypatch):
    from hypergef_tpu.ops import fused

    hg, plan = aligned_plan
    monkeypatch.setenv("HYPERGEF_ALIGNED_PALLAS", "1")
    hgd = hg.device_data()
    dev = plan.as_device()
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(hg.num_nodes, 32)).astype(np.float32))

    @jax.jit
    def step(a, pd):
        return fused.hgnn_aggregate(hgd, a, None, "sum", plan=pd,
                                    backend="aligned")

    y = step(x, dev)
    monkeypatch.setenv("HYPERGEF_ALIGNED_PALLAS", "0")
    yr = fused.hgnn_aggregate(hgd, x, None, "sum", plan=plan,
                              backend="aligned")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-6, atol=1e-6)
