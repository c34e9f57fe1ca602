from fitgnn_tpu.models.layers import (
    GCNConv, GATConv, SAGEConv, GINConv, make_layer, LAYER_REGISTRY,
)
from fitgnn_tpu.models.models import ConvStack, NodeModel, GraphModel

__all__ = [
    "GCNConv", "GATConv", "SAGEConv", "GINConv", "make_layer",
    "LAYER_REGISTRY", "ConvStack", "NodeModel", "GraphModel",
]
