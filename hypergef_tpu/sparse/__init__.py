from hypergef_tpu.sparse.hypergraph import Hypergraph
from hypergef_tpu.sparse.planner import TilePlan, plan_tiles

__all__ = ["Hypergraph", "TilePlan", "plan_tiles"]
