"""Entity-scale axis: training + eval throughput at Wikidata5M size
(4.8M entities — the reference's largest published recipe, README
Wikidata5M: shared NegSamp, dim 128, batch 1024, Adagrad).

Synthetic triples (no dataset egress in this environment); the step
cost depends on vocabulary size and batch shape, not on graph size, so
throughput here is the real thing. Known backend fault: fused
loss + row-scatter programs on one table buffer > ~1 GiB crash the TPU
worker, so sparse updates auto-cap and this scale runs DENSE on one
chip; vocabulary sharding over the mesh is the intended path past it
(tpu.mesh.model > 1 splits the table below the cap per shard).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(num_entities=4_818_679, dim=128):
    from bench import build_synthetic_dataset
    from kge_tpu import Config
    from kge_tpu.train.train import TrainingJob

    config = Config()
    config.folder = None
    config.set("console.quiet", True)
    config.set("model", "complex")
    config._import("complex")
    config.set("lookup_embedder.dim", dim)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 1024)
    config.set("negative_sampling.num_samples.s", 128)
    config.set("negative_sampling.num_samples.o", 128)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.implementation", "batch")
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("random_seed.default", 13)
    config.set("valid.every", 0)
    dataset = build_synthetic_dataset(
        config, num_entities=num_entities, num_relations=828,
        num_triples=500_000,
    )
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True

    from harness import measure_steps

    sec_per_step, _, _ = measure_steps(job, steps=16, distinct_batches=4)
    train_tps = job.batch_size / sec_per_step

    # fused entity-ranking eval over all 4.8M candidates
    from kge_tpu.evaluation.eval import EvaluationJob

    config.set("job.type", "eval")
    config.set("eval.split", "test")
    config.set("eval.batch_size", 1024)
    config.set("entity_ranking.implementation", "fused")
    config.set("entity_ranking.filter_splits", ["train", "valid", "test"])
    config.set("entity_ranking.chunk_size", 1 << 19)
    eval_job = EvaluationJob.create(config, dataset, model=job.model)
    eval_job.set_params(job.params, job.model_state)
    eval_job.verbose = False
    eval_job._is_prepared = False
    eval_job._evaluate()  # compile (also resets triples via _prepare)
    n_eval = len(eval_job.triples)
    t0 = time.perf_counter()
    eval_job._evaluate()
    eval_qps = n_eval / (time.perf_counter() - t0)

    table_gb = num_entities * dim * 4 / 2 ** 30
    print(json.dumps({
        "metric": "wikidata5m_scale_train_triples_per_s",
        "value": round(train_tps, 1),
        "unit": "triples/s/chip (dense updates; 2.3 GiB entity table)",
        "eval_queries_per_s": round(eval_qps, 1),
        "num_entities": num_entities,
        "entity_table_GiB": round(table_gb, 2),
        "step_ms": round(sec_per_step * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
