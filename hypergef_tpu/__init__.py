"""hypergef_tpu — a TPU-native hypergraph-GNN framework.

A from-scratch JAX / XLA / Pallas re-architecture of the capabilities of
HyperGef (MLSys'23, ``fishmingyu/HyperGef``): HGNNConv and UniGNNConv
(UniGIN / UniGCNII) model families whose hot path — the two-stage
incidence-matrix aggregation V→E→V — runs as fused, statically
load-balanced TPU kernels with exact autodiff.

Design stance (vs the CUDA reference):

* The CUDA chunk-pair + atomicAdd fused kernel (reference
  ``source/hgnnaggr/hgnnaggr_cuda.cu:14-47``) becomes a gather →
  segment-reduce → scatter pipeline over *static-shape* index arrays
  emitted ahead of time by a host-side tiling planner
  (:mod:`hypergef_tpu.sparse.planner`), the direct TPU descendant of the
  reference's CPU balancer (``include/taskbalancer/balancer_kernel.cuh:229-259``).
* There are no atomics on TPU — races are designed out; segment
  reductions are deterministic.
* Autodiff is exact (custom VJP on the fused op), not the reference's
  symmetric approximation (``source/hgnnaggr/hgnnaggr.cc:51-64``).
* Multi-chip scaling (absent in the single-GPU reference) is built in:
  hyperedge-contiguous nnz sharding over a ``jax.sharding.Mesh`` with
  collective combination of boundary vertex partials
  (:mod:`hypergef_tpu.parallel`).
"""

__version__ = "0.1.0"

from hypergef_tpu.sparse.hypergraph import Hypergraph
from hypergef_tpu.sparse.planner import (
    AggregationPlan,
    TilePlan,
    TreePlan,
    plan_aggregation,
    plan_tiles,
    plan_tree,
)
from hypergef_tpu import ops
from hypergef_tpu import models

__all__ = [
    "Hypergraph",
    "TilePlan",
    "TreePlan",
    "AggregationPlan",
    "plan_tiles",
    "plan_tree",
    "plan_aggregation",
    "ops",
    "models",
]
