from kge_tpu.train.job import Job, TrainingOrEvaluationJob
from kge_tpu.train.train import TrainingJob
from kge_tpu.train.train_1vsall import TrainingJob1vsAll
from kge_tpu.train.train_kvsall import TrainingJobKvsAll
from kge_tpu.train.train_negative_sampling import TrainingJobNegativeSampling
from kge_tpu.train.loss import KgeLoss
from kge_tpu.train.optimizer import KgeLRScheduler, KgeOptimizer
from kge_tpu.train.sampler import KgeSampler
