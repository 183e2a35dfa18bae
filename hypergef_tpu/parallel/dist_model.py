"""Distributed full-batch training step (edge-partitioned HGNN).

The multi-chip training path for BASELINE config #5: a functional 2-layer
HGNN whose aggregations run the edge-partitioned ``shard_map`` program
(:mod:`hypergef_tpu.parallel.dist_aggr`) while the dense projections and
optimizer run under GSPMD around it.  Works on any ``(e, f)`` mesh —
including the simulated CPU mesh used in tests and the driver's
multi-chip dry-run.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from hypergef_tpu.parallel.dist_aggr import sharded_hgnn_aggregate
from hypergef_tpu.train.trainer import make_optimizer


def init_dist_params(rng, nfeat: int, nhid: int, nclass: int, class_pad: int = 1):
    """``class_pad``: round the classifier width up to this multiple so
    the logits dimension stays divisible by the feature-mesh axis."""
    k1, k2 = jax.random.split(rng)
    ncls_p = -(-nclass // class_pad) * class_pad
    scale1 = (1.0 / nfeat) ** 0.5
    scale2 = (1.0 / nhid) ** 0.5
    return {
        "W1": jax.random.uniform(k1, (nfeat, nhid), minval=-scale1, maxval=scale1),
        "W2": jax.random.uniform(k2, (nhid, ncls_p), minval=-scale2, maxval=scale2),
    }


def make_dist_train_step(
    mesh,
    plan,
    degV,
    lr: float = 0.01,
    wd: float = 5e-4,
    first_aggr: str = "sum",
    feature_sharded: bool = False,
    nclass: int = None,
):
    """Returns (jitted_step, tx, forward, run_epochs) for the 2-layer distributed HGNN.

    step(params, opt_state, x, y, train_mask) -> (params, opt_state, loss)
    When the classifier width is padded for feature-mesh divisibility,
    pass ``nclass`` so padded logit columns are masked out of the softmax.
    """
    tx = make_optimizer(lr, wd)

    def forward(params, x):
        h = sharded_hgnn_aggregate(
            plan, mesh, x @ params["W1"], None, first_aggr, degV=degV,
            feature_sharded=feature_sharded,
        )
        h = jax.nn.relu(h)
        z = sharded_hgnn_aggregate(
            plan, mesh, h @ params["W2"], None, first_aggr, degV=degV,
            feature_sharded=feature_sharded,
        )
        if nclass is not None and z.shape[1] > nclass:
            ncols = z.shape[1]
            col = jnp.arange(ncols)[None, :]
            z = jnp.where(col < nclass, z, -1e30)
        return jax.nn.log_softmax(z, axis=1)

    def loss_fn(params, x, y, train_mask):
        logp = forward(params, x)
        # padded classifier columns (feature-mesh divisibility) are
        # excluded by indexing true labels only
        picked = jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        return -jnp.sum(picked * train_mask) / jnp.maximum(train_mask.sum(), 1.0)

    def _step(params, opt_state, x, y, train_mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, train_mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(_step)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_epochs(params, opt_state, x, y, train_mask, n):
        """``n`` chained epochs as ONE jitted program (lax.scan): one
        dispatch regardless of epoch count.  This is both the idiomatic
        TPU timing unit (dispatch latency excluded by construction) and
        the root fix for the simulated CPU mesh's async-queue abort —
        with a single in-flight program there is no dispatch queue to
        overflow (round-1 workaround was per-step value fencing)."""

        def body(carry, _):
            params, opt_state, _ = carry
            return _step(params, opt_state, x, y, train_mask), None

        init = (params, opt_state, jnp.zeros(()))
        (params, opt_state, loss), _ = jax.lax.scan(
            body, init, None, length=n)
        return params, opt_state, loss

    return step, tx, forward, run_epochs
