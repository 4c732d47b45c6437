from kge_tpu.models.rgnn.encoder import (
    CompGCN,
    KgeRgnnModel,
    RAGAT,
    RGCN,
    Rgnn,
    RgnnEncoder,
    WGCN,
    build_graph_buffers,
)
from kge_tpu.models.rgnn.layers import (
    MessagePassingLayer,
    RgcnLayer,
    WeightedGCNLayer,
)
