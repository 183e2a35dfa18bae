"""Pallas sparse level-0 kernels (ops/pallas_sparse) in interpret mode:
kernel parity with the numpy oracle, the pallas-form tree plan through
the dispatcher, and gradients via the tree VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypergef_tpu.data.synthetic import powerlaw_hypergraph, random_hypergraph
from hypergef_tpu.ops import fused
from hypergef_tpu.ops.pallas_sparse import ell_gather_sum
from hypergef_tpu.sparse.planner import plan_pallas_sparse

from conftest import dense_hgnn_oracle


@pytest.mark.parametrize("impl", ["vmem", "dma"])
def test_ell_gather_sum_kernel(impl):
    rng = np.random.default_rng(0)
    n, c, ngs, f = 300, 700, 8, 16  # c not a BLOCK_CHUNKS multiple → pads
    x = rng.normal(size=(n, f)).astype(np.float32)
    gidx = rng.integers(0, n, size=(c, ngs)).astype(np.int32)
    mask = (rng.random((c, ngs)) > 0.2).astype(np.float32)
    want = (x[gidx.reshape(-1)].reshape(c, ngs, f) * mask[:, :, None]).sum(1)
    got = ell_gather_sum(jnp.asarray(x), jnp.asarray(gidx), jnp.asarray(mask),
                         impl=impl, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", [0, 1])
def test_pallas_sparse_backend_parity(case):
    gen, n, e, kw = [
        (random_hypergraph, 120, 80, dict(avg_edge_size=4.0)),
        (powerlaw_hypergraph, 150, 100, dict(alpha=1.6)),
    ][case]
    out = gen(n, e, seed=600 + case, **kw)
    hg = out[0] if isinstance(out, tuple) else out
    hgd = hg.device_data()
    plan = plan_pallas_sparse(hg, impl="vmem")
    rng = np.random.default_rng(case)
    x = rng.normal(size=(hg.num_nodes, 5)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (hg.num_edges, 1)).astype(np.float32)
    for aggr in ("sum", "mean"):
        want = dense_hgnn_oracle(hg, x, w, aggr)
        got = fused.hgnn_aggregate(
            hgd, x, jnp.asarray(w), aggr, plan=plan, backend="pallas_sparse"
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-3, atol=1e-3,
            err_msg=f"case {case} aggr {aggr}",
        )


def test_pallas_sparse_grad():
    out = random_hypergraph(100, 70, seed=7, avg_edge_size=4.0)
    hg = out[0] if isinstance(out, tuple) else out
    hgd = hg.device_data()
    plan = plan_pallas_sparse(hg, impl="vmem")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(hg.num_nodes, 3)).astype(np.float32)
    )

    def loss(backend, p):
        return lambda xv: jnp.sum(
            fused.hgnn_aggregate(hgd, xv, None, "sum", plan=p, backend=backend) ** 2
        )

    ref = np.asarray(jax.grad(loss("xla", None))(x))
    got = np.asarray(jax.grad(loss("pallas_sparse", plan))(x))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
