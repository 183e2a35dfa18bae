"""End-to-end hypergraph-GNN models (flax.linen).

Stack structure mirrors the reference wrappers exactly:

* :class:`HGNN` / :class:`UniGIN` ↔ ``model/gnn.py:110-134`` (the
  HGsysHGNN wrapper, identical to the PyG/DGL wrappers): input-dropout →
  [conv → activation → dropout]×(nlayer-1) → conv_out → log_softmax.
* :class:`UniGCNII` ↔ ``model/gnn.py:176-208``: Linear → nlayer
  UniGCNIIConv with α=0.1, β_i=log(λ/(i+1)+1), λ=0.5 → Linear, with
  dropout and ReLU as in the reference forward.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hypergef_tpu.models.layers import HGNNConv, UniGINConv, UniGCNIIConv

_ACTS = {
    "relu": nn.relu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
}
# 'prelu' (offered by the reference for UniGCNII, gnn.py:152) is a
# parameterized module — handled inside the models via nn.PReLU.


class HGNN(nn.Module):
    nhid: int
    nclass: int
    nlayer: int = 2
    first_aggr: str = "sum"
    nhead: int = 1
    dropout: float = 0.6
    input_drop: float = 0.6
    activation: str = "relu"
    learn_wdiag: bool = False
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, hgd, plan=None, deterministic: bool = True):
        act = _ACTS[self.activation]
        x = nn.Dropout(self.input_drop, deterministic=deterministic)(x)
        for _ in range(self.nlayer - 1):
            x = HGNNConv(
                self.nhid,
                first_aggr=self.first_aggr,
                heads=self.nhead,
                learn_wdiag=self.learn_wdiag,
                backend=self.backend,
            )(x, hgd, plan)
            x = act(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        # DELIBERATE deviation from the reference: its conv_out keeps
        # heads=nhead, emitting nhead*nclass logits and softmaxing over
        # that widened vector (gnn.py conv_out quirk) — here the output
        # layer is heads=1 so logits == nclass for any nhead.  Defaults
        # (nhead=1) are identical.
        x = HGNNConv(
            self.nclass,
            first_aggr=self.first_aggr,
            heads=1,
            learn_wdiag=self.learn_wdiag,
            backend=self.backend,
        )(x, hgd, plan)
        return nn.log_softmax(x, axis=1)


class UniGIN(nn.Module):
    nhid: int
    nclass: int
    nlayer: int = 2
    nhead: int = 1
    dropout: float = 0.6
    input_drop: float = 0.6
    activation: str = "relu"
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, hgd, plan=None, deterministic: bool = True):
        act = _ACTS[self.activation]
        x = nn.Dropout(self.input_drop, deterministic=deterministic)(x)
        for _ in range(self.nlayer - 1):
            x = UniGINConv(self.nhid, heads=self.nhead, backend=self.backend)(
                x, hgd, plan
            )
            x = act(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = UniGINConv(self.nclass, heads=1, backend=self.backend)(x, hgd, plan)
        return nn.log_softmax(x, axis=1)


class UniGCNII(nn.Module):
    nhid: int
    nclass: int
    nlayer: int = 2
    nhead: int = 1
    dropout: float = 0.6
    activation: str = "relu"
    lamda: float = 0.5
    alpha: float = 0.1
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, hgd, plan=None, deterministic: bool = True):
        if self.activation == "prelu":
            act = nn.PReLU()  # single shared learnable slope (ref gnn.py:152)
        else:
            act = _ACTS[self.activation]
        nhid = self.nhid * self.nhead
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = act(nn.Dense(nhid, name="lin_in")(x))
        x0 = x
        for i in range(self.nlayer):
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            beta = math.log(self.lamda / (i + 1) + 1.0)
            x = act(
                UniGCNIIConv(nhid, backend=self.backend)(
                    x, x0, self.alpha, beta, hgd, plan
                )
            )
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.nclass, name="lin_out")(x)
        return nn.log_softmax(x, axis=1)


def build_model(
    model: str,
    nfeat: int,
    nhid: int,
    nclass: int,
    nlayer: int = 2,
    first_aggr: str = "sum",
    nhead: int = 1,
    dropout: float = 0.6,
    input_drop: float = 0.6,
    activation: str = "relu",
    backend: Optional[str] = None,
):
    """Model registry — the analogue of ``model/gnn.py:15-28`` dicts
    collapsed across backends (backend is an op-level choice here)."""
    del nfeat  # shapes are inferred at init time by flax
    if model == "HGNN":
        return HGNN(
            nhid=nhid,
            nclass=nclass,
            nlayer=nlayer,
            first_aggr=first_aggr,
            nhead=nhead,
            dropout=dropout,
            input_drop=input_drop,
            activation=activation,
            backend=backend,
        )
    if model == "UniGIN":
        return UniGIN(
            nhid=nhid,
            nclass=nclass,
            nlayer=nlayer,
            nhead=nhead,
            dropout=dropout,
            input_drop=input_drop,
            activation=activation,
            backend=backend,
        )
    if model == "UniGCNII":
        return UniGCNII(
            nhid=nhid,
            nclass=nclass,
            nlayer=nlayer,
            nhead=nhead,
            dropout=dropout,
            activation=activation,
            backend=backend,
        )
    raise ValueError(f"unknown model {model!r} (HGNN | UniGIN | UniGCNII)")
