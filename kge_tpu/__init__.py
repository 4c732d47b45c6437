"""TPU-native knowledge graph embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference LibKGE fork (training, evaluation, and hyperparameter search of
KGE models plus relational GNN encoders), built for TPU meshes: functional
model cores, one compiled train step per strategy, vocabulary-sharded
embedding tables, and rank-counting evaluation via sharded score matmuls.
"""

from kge_tpu.config import Config, Configurable
from kge_tpu.dataset import Dataset

__version__ = "0.1.0"

__all__ = ["Config", "Configurable", "Dataset"]
