from kge_tpu.models.embedder.lookup import LookupEmbedder
from kge_tpu.models.embedder.projection import (
    ProjectionEmbedder,
    Tucker3RelationEmbedder,
)
