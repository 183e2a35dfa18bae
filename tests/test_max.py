"""Fast max first-aggregation (ops/maxops): forward/grad parity with the
nnz oracle (refops.segment_max_gather), incl. reference tie-breaking
(first maximal member in CSR order, hgnnaggr_cuda.cu:144-208)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypergef_tpu.data.synthetic import powerlaw_hypergraph, random_hypergraph
from hypergef_tpu.ops import fused, maxops, refops
from hypergef_tpu.sparse.planner import plan_aggregation

from conftest import dense_hgnn_oracle

CASES = [
    (random_hypergraph, 64, 40, dict(avg_edge_size=3.0)),
    (random_hypergraph, 300, 500, dict(avg_edge_size=2.0)),
    (powerlaw_hypergraph, 200, 150, dict(alpha=1.6)),
    (random_hypergraph, 50, 7, dict(avg_edge_size=20.0)),
]


def _case(i):
    gen, n, e, kw = CASES[i]
    out = gen(n, e, seed=400 + i, **kw)
    hg = out[0] if isinstance(out, tuple) else out
    return hg, hg.device_data(), plan_aggregation(hg)


@pytest.mark.parametrize("case", range(len(CASES)))
def test_max_forward_parity(case):
    hg, hgd, plan = _case(case)
    rng = np.random.default_rng(case)
    x = rng.normal(size=(hg.num_nodes, 6)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (hg.num_edges, 1)).astype(np.float32)
    want = dense_hgnn_oracle(hg, x, w, "max")
    for backend in ("auto", "tree", "cumsum", "dense"):
        if backend == "dense" and plan.dense is None:
            continue
        got = fused.hgnn_aggregate(
            hgd, x, jnp.asarray(w), "max", plan=plan, backend=backend
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-3, atol=2e-3,
            err_msg=f"case {case} backend {backend}",
        )


@pytest.mark.parametrize("case", [0, 1, 2])
def test_max_grad_matches_oracle(case):
    """Exact-VJP parity: tree-max backward must equal the oracle backward
    (both route each cotangent to the first CSR-order argmax member)."""
    hg, hgd, plan = _case(case)
    x = jnp.asarray(
        np.random.default_rng(case).normal(size=(hg.num_nodes, 4)).astype(np.float32)
    )

    def loss(backend):
        return lambda xv: jnp.sum(
            fused.hgnn_aggregate(hgd, xv, None, "max", plan=plan, backend=backend)
            ** 2
        )

    ref = np.asarray(jax.grad(loss("xla"))(x))
    got = np.asarray(jax.grad(loss("tree"))(x))
    # routing is exactly identical (argmax tables match bit-for-bit,
    # verified); residual difference is cumsum-prefix f32 roundoff in
    # segment_sum_sorted (~eps·|running prefix|)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                               err_msg=f"case {case}")


def test_max_tie_breaking_first_csr_member():
    """With duplicated feature values the cotangent must flow to the
    FIRST member vertex in CSR order (reference strict-> semantics)."""
    hg, hgd, plan = _case(0)
    # constant features → every member ties; argmax must be the first
    x = jnp.ones((hg.num_nodes, 3), dtype=jnp.float32)
    e_stage, _ = plan.tree.device()
    _, arg = maxops.tree_max_with_arg(x, e_stage)
    arg = np.asarray(arg)
    ht_indptr = np.asarray(hgd.ht_indptr)
    ht_vertex = np.asarray(hgd.ht_vertex)
    for e in range(hg.num_edges):
        lo, hi = int(ht_indptr[e]), int(ht_indptr[e + 1])
        if hi > lo:
            assert (arg[e] == ht_vertex[lo]).all(), f"edge {e}"
        else:
            assert (arg[e] == -1).all()


def test_max_grad_finite_difference():
    """FD check on a non-tied input (unique values ⇒ differentiable)."""
    hg, hgd, plan = _case(1)
    n = hg.num_nodes
    x = jnp.asarray(
        (np.arange(n * 2, dtype=np.float32).reshape(n, 2) * 0.37) % 7.0
    )
    f = lambda xv: jnp.sum(
        jnp.sin(fused.hgnn_aggregate(hgd, xv, None, "max", plan=plan, backend="tree"))
    )
    g = np.asarray(jax.grad(f)(x))
    rng = np.random.default_rng(0)
    for _ in range(4):
        i, j = rng.integers(0, n), rng.integers(0, 2)
        eps = 1e-3
        xp = x.at[i, j].add(eps)
        xm = x.at[i, j].add(-eps)
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        assert abs(fd - g[i, j]) < 5e-2, (i, j, fd, g[i, j])


def test_max_empty_segments():
    """Hyperedges with no members produce y=0 and zero gradient flow."""
    from hypergef_tpu.sparse.hypergraph import Hypergraph

    # edge 1 is empty
    vertex = np.array([0, 1, 2, 0, 3], dtype=np.int64)
    edge = np.array([0, 0, 0, 2, 2], dtype=np.int64)
    hg = Hypergraph.from_coo(vertex, edge, num_nodes=4, num_edges=3)
    hgd = hg.device_data()
    plan = plan_aggregation(hg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32))
    got = fused.hgnn_aggregate(hgd, x, None, "max", plan=plan, backend="tree")
    ref = refops.hgnn_aggregate_ref(hgd, x, None, "max")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
