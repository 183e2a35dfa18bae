from hypergef_tpu.models.layers import HGNNConv, UniGINConv, UniGCNIIConv
from hypergef_tpu.models.zoo import HGNN, UniGIN, UniGCNII, build_model

__all__ = [
    "HGNNConv",
    "UniGINConv",
    "UniGCNIIConv",
    "HGNN",
    "UniGIN",
    "UniGCNII",
    "build_model",
]
