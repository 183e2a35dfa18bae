"""Fused dense Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypergef_tpu.ops import pallas_kernels as pk
from hypergef_tpu.sparse.planner import plan_aggregation

from conftest import dense_hgnn_oracle, dense_unignn_oracle


def rand_x(hg, f=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(hg.num_nodes, f)).astype(np.float32)
    )


def test_fused_dense_two_stage_matches_oracle(small_hg):
    hg = small_hg
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    x = rand_x(hg, f=8, seed=1)
    got = pk.hgnn_aggregate_pallas(hgd, x, None, "sum", plan, interpret=True)
    want = dense_hgnn_oracle(hg, np.asarray(x), None, "sum")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_fused_dense_nonaligned_shapes():
    """Odd N/E/F exercise the padding paths."""
    from hypergef_tpu.data.synthetic import random_hypergraph

    hg = random_hypergraph(301, 187, avg_edge_size=5.0, seed=2)
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    x = rand_x(hg, f=17, seed=3)
    got = pk.hgnn_aggregate_pallas(hgd, x, None, "sum", plan, interpret=True)
    want = dense_hgnn_oracle(hg, np.asarray(x), None, "sum")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_fused_dense_wdiag_and_grads(small_hg):
    hg = small_hg
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    x = rand_x(hg, f=4, seed=4)
    w = jnp.asarray(
        np.random.default_rng(5).uniform(0.5, 1.5, (hg.num_edges, 1)).astype(np.float32)
    )
    got = pk.hgnn_aggregate_pallas(hgd, x, w, "sum", plan, interpret=True)
    want = dense_hgnn_oracle(hg, np.asarray(x), np.asarray(w), "sum")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)

    # dx vs the tree backend's exact adjoint
    from hypergef_tpu.ops import fused
    from hypergef_tpu.sparse.planner import plan_tree

    tplan = plan_tree(hg)
    g_pallas = jax.grad(
        lambda xv: jnp.sum(
            pk.hgnn_aggregate_pallas(hgd, xv, w, "sum", plan, interpret=True) ** 2
        )
    )(x)
    g_tree = jax.grad(
        lambda xv: jnp.sum(
            fused.hgnn_aggregate(hgd, xv, w, "sum", plan=tplan, backend="tree") ** 2
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_tree), rtol=5e-2, atol=5e-2
    )


def test_wdiag_gradient_flows(small_hg):
    """Learnable Wdiag: d loss / d wdiag via the custom VJP."""
    hg = small_hg
    plan = plan_aggregation(hg)
    hgd = hg.device_data()
    x = rand_x(hg, f=4, seed=6)
    w0 = jnp.ones((hg.num_edges, 1), jnp.float32)

    def loss(w):
        return jnp.sum(
            pk.hgnn_aggregate_pallas(hgd, x, w, "sum", plan, interpret=True) ** 2
        )

    g = jax.grad(loss)(w0)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference spot check on one hyperedge
    eps = 1e-2
    e0 = 3
    wp = w0.at[e0, 0].add(eps)
    wm = w0.at[e0, 0].add(-eps)
    fd = (loss(wp) - loss(wm)) / (2 * eps)
    np.testing.assert_allclose(float(g[e0, 0]), float(fd), rtol=5e-2, atol=5e-2)


def test_pallas_backend_guards(small_hg):
    hg = small_hg
    hgd = hg.device_data()
    plan = plan_aggregation(hg)
    x = rand_x(hg, f=4)
    with pytest.raises(ValueError, match="sum"):
        pk.hgnn_aggregate_pallas(hgd, x, None, "max", plan, interpret=True)
