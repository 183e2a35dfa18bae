from hypergef_tpu.parallel.partition import (
    ShardedAggPlan,
    edge_partition_bounds,
    plan_sharded_aggregation,
)
from hypergef_tpu.parallel.dist_aggr import (
    sharded_hgnn_aggregate,
    sharded_unignn_aggregate,
)
from hypergef_tpu.parallel.mesh import make_mesh

__all__ = [
    "ShardedAggPlan",
    "edge_partition_bounds",
    "plan_sharded_aggregation",
    "sharded_hgnn_aggregate",
    "sharded_unignn_aggregate",
    "make_mesh",
]
