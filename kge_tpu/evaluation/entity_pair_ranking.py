"""Entity-pair ranking evaluation.

The reference registers this job type but never implements it
(reference: kge/job/eval_entity_pair_ranking.py:4-12 is a stub without
``_evaluate``); this class preserves the registration point for API
parity and raises on use, exactly like the reference would.
"""

from __future__ import annotations

from kge_tpu.evaluation.eval import EvaluationJob


class EntityPairRankingJob(EvaluationJob):
    def __init__(self, config, dataset, parent_job=None, model=None):
        super().__init__(config, dataset, parent_job, model=model)

    def _evaluate(self):
        raise NotImplementedError(
            "entity_pair_ranking is registered but not implemented "
            "(the reference ships the same stub)"
        )
