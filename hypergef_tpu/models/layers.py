"""Hypergraph convolution layers (flax.linen).

One implementation per conv family — there is no per-backend model code
as in the reference (which triplicates every conv across pyg/dgl/ugsys,
``model/gnn.py:15-28``); the aggregation backend is selected underneath
by :mod:`hypergef_tpu.ops.fused`, so every layer runs on the oracle XLA
path, the ELL path, or the fused Pallas kernels unchanged.

Semantics parity:

* :class:`HGNNConv` ↔ ``model/ugsys/hgnn.py:7-27`` / ``model/pygnn/
  hgnn.py:25-38`` (projection then fused aggregation with per-hyperedge
  diagonal weight; ``Wdiag`` is a ones buffer in the reference, here
  optionally learnable).
* :class:`UniGINConv` ↔ ``model/pygnn/unigin.py:17-26``:
  ``(1+ε)·XW + H Hᵀ (XW)`` with learnable scalar ε (init 0).
* :class:`UniGCNIIConv` ↔ ``model/pygnn/unigcnii.py:23-36``: degree-
  scaled propagation plus α/β identity-mapping residuals.  (The
  reference's own fused UniGCNII path is dead code — SURVEY.md §2.8-2 —
  so the PyG semantics are the ground truth.)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hypergef_tpu.ops import fused
from hypergef_tpu.sparse.hypergraph import HypergraphData


class HGNNConv(nn.Module):
    out_features: int
    first_aggr: str = "sum"
    heads: int = 1
    learn_wdiag: bool = False
    backend: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hgd: HypergraphData, plan=None):
        x = nn.Dense(
            self.heads * self.out_features,
            use_bias=False,
            param_dtype=self.param_dtype,
            name="linear",
        )(x)
        num_edges = hgd.num_edges
        if self.learn_wdiag:
            wdiag = self.param(
                "wdiag", nn.initializers.ones, (num_edges, 1), self.param_dtype
            )
        else:
            # frozen Wdiag ≡ ones: pass None so backends that fold the
            # scaling ahead of time (precomp) stay applicable
            wdiag = None
        return fused.hgnn_aggregate(
            hgd, x, wdiag, self.first_aggr, plan=plan, backend=self.backend
        )


class UniGINConv(nn.Module):
    out_features: int
    heads: int = 1
    backend: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hgd: HypergraphData, plan=None):
        x = nn.Dense(
            self.heads * self.out_features,
            use_bias=False,
            param_dtype=self.param_dtype,
            name="linear",
        )(x)
        eps = self.param("eps", nn.initializers.zeros, (1,), self.param_dtype)
        xv = fused.unignn_aggregate(hgd, x, use_deg=False, plan=plan, backend=self.backend)
        return (1.0 + eps) * x + xv


class UniGCNIIConv(nn.Module):
    out_features: int
    backend: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x0, alpha, beta, hgd: HypergraphData, plan=None):
        xv = fused.unignn_aggregate(hgd, x, use_deg=True, plan=plan, backend=self.backend)
        xi = (1.0 - alpha) * xv + alpha * x0
        wx = nn.Dense(
            self.out_features,
            use_bias=False,
            param_dtype=self.param_dtype,
            name="W",
        )(xi)
        return (1.0 - beta) * xi + beta * wx
