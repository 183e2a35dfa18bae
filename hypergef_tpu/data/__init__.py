from hypergef_tpu.data.synthetic import random_hypergraph, powerlaw_hypergraph

__all__ = ["random_hypergraph", "powerlaw_hypergraph"]
