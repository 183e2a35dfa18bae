"""Regression tests for the backend auto-selection ladder.

A mis-attached branch here once routed 20news-shaped graphs to BSR
(8× slower there) — lock the canonical routings down.
"""

import numpy as np
import pytest

from hypergef_tpu.data.synthetic import random_hypergraph
from hypergef_tpu.sparse.planner import plan_aggregation


def test_cora_shape_prefers_precomp():
    hg = random_hypergraph(2708, 2708, avg_edge_size=4.0, seed=0)
    plan = plan_aggregation(hg)
    # N == E: precomputed A (one matmul) is the best fused layer
    assert plan.preferred_backend == "precomp"
    assert plan.precomp is not None


def test_20news_shape_prefers_dense_two_stage():
    # few giant hyperedges: N >> E → A (N²) is 80× the two H reads
    hg = random_hypergraph(16242, 100, avg_edge_size=654.5, seed=0)
    plan = plan_aggregation(hg)
    assert plan.preferred_backend in ("dense", "pallas")
    assert plan.bsr is None  # dense-eligible graphs must not build BSR


def test_large_sparse_prefers_tree_unless_bsr_fill():
    hg = random_hypergraph(60_000, 30_000, avg_edge_size=8.0, seed=0)
    plan = plan_aggregation(hg)
    # uniform random graph: BSR fill is far below threshold
    assert plan.preferred_backend == "tree"
    assert plan.dense is None and plan.precomp is None


def test_every_preference_is_runnable(small_hg):
    """Whatever the ladder picks must execute via backend='auto'."""
    import jax.numpy as jnp

    from hypergef_tpu.ops import fused

    plan = plan_aggregation(small_hg)
    hgd = small_hg.device_data()
    x = jnp.ones((small_hg.num_nodes, 4), jnp.float32)
    out = fused.hgnn_aggregate(hgd, x, None, "sum", plan=plan, backend="auto")
    assert np.isfinite(np.asarray(out)).all()
