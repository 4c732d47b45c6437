"""Entity-pair ranking (implemented here; the reference ships a stub).

Checked against a brute-force numpy referee: score every (s', o') pair
under each test triple's relation, rank the true pair with
rounded-mean-rank tie handling, filter true pairs of the relation.
"""

import numpy as np
import jax
import pytest

from kge_tpu import Dataset
from kge_tpu.evaluation.eval import EvaluationJob
from kge_tpu.models import Ctx, KgeModel

from tests.util import create_config, get_dataset_folder


@pytest.mark.parametrize("chunk_size", [-1, 3])
def test_matches_brute_force(chunk_size):
    config = create_config("dataset_test", model="complex")
    config.set("job.type", "eval")
    config.set("eval.type", "entity_pair_ranking")
    config.set("eval.split", "test")
    config.set("lookup_embedder.dim", 12)
    config.set("entity_pair_ranking.chunk_size", chunk_size)
    config.set("entity_ranking.hits_at_k_s", [1, 3, 10])
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(5))
    job = EvaluationJob.create(config, dataset, model=model)
    assert type(job).__name__ == "EntityPairRankingJob"
    job.set_params(params, model.init_state())
    job.verbose = False
    entry = job._run()

    # brute-force referee
    E = dataset.num_entities()
    atol, rtol = 1e-5, 1e-4
    pairs_by_p = {}
    for split in ("train", "valid", "test"):
        for s, p, o in np.asarray(dataset.split(split)):
            pairs_by_p.setdefault(int(p), set()).add((int(s), int(o)))

    def score_all_pairs(p):
        ctx = Ctx()
        s_ids = np.repeat(np.arange(E), E).astype(np.int32)
        o_ids = np.tile(np.arange(E), E).astype(np.int32)
        p_ids = np.full(E * E, p, np.int32)
        return np.asarray(
            model.score_spo(params, s_ids, p_ids, o_ids, direction="o",
                            ctx=ctx)
        ).reshape(E, E)

    raw_ranks, f_ranks = [], []
    for s, p, o in np.asarray(dataset.split("test")):
        s, p, o = int(s), int(p), int(o)
        m = score_all_pairs(p)
        t = m[s, o]
        close = np.abs(m - t) <= atol + rtol * np.abs(t)
        greater = (m > t) & ~close
        raw_g, raw_t = int(greater.sum()), int(close.sum())
        mask = np.zeros((E, E), bool)
        for (fs, fo) in pairs_by_p.get(p, set()) - {(s, o)}:
            mask[fs, fo] = True
        f_g = int((greater & ~mask).sum())
        f_t = raw_t - int((close & mask).sum())
        def final(g, t_):
            return g + ((max(t_ - 1, 0)) + 1) // 2
        raw_ranks.append(final(raw_g, raw_t) + 1)
        f_ranks.append(final(f_g, f_t) + 1)

    assert abs(entry["mean_reciprocal_rank"]
               - np.mean(1.0 / np.asarray(raw_ranks))) < 1e-9
    assert abs(entry["mean_reciprocal_rank_filtered"]
               - np.mean(1.0 / np.asarray(f_ranks))) < 1e-9
    assert abs(entry["mean_rank_filtered"] - np.mean(f_ranks)) < 1e-9
