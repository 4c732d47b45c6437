from kge_tpu.models.api import (
    Ctx,
    KgeBase,
    KgeEmbedder,
    KgeModel,
    RelationalScorer,
)
from kge_tpu.models.factorization import (
    CP,
    CPScorer,
    ComplEx,
    ComplExScorer,
    DistMult,
    DistMultScorer,
    RelationalTucker3,
    Rescal,
    RescalScorer,
    SimplE,
    SimplEScorer,
)
from kge_tpu.models.translation import (
    RotatE,
    RotatEScorer,
    TransE,
    TransEScorer,
    TransH,
    TransHScorer,
)
from kge_tpu.models.conve import ConvE, ConvEScorer
from kge_tpu.models.transformer import Transformer, TransformerScorer
from kge_tpu.models.reciprocal import ReciprocalRelationsModel
from kge_tpu.models.embedder import (
    LookupEmbedder,
    ProjectionEmbedder,
    Tucker3RelationEmbedder,
)
from kge_tpu.models.rgnn import (
    CompGCN,
    KgeRgnnModel,
    RAGAT,
    RGCN,
    RgnnEncoder,
    WGCN,
)
