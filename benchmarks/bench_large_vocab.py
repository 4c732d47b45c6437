"""Large-vocabulary training throughput: ComplEx negative sampling at
Wikidata5M-like entity counts, where dense [V, D] table updates dominate
the step and row-sparse updates (tpu.sparse_updates) pay off.

Measured on v5e (V=500k, dim 128, batch 1024, 2x128 shared negatives):
dense 4.19 ms/step vs sparse 2.03 ms/step (2.06x); the gap grows
linearly with V (dense update traffic is O(V), sparse is O(batch)).
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(num_entities=500_000, num_relations=500, num_triples=300_000,
         sparse="auto"):
    from bench import build_synthetic_dataset
    from kge_tpu import Config
    from kge_tpu.train.train import TrainingJob
    from harness import measure_steps

    config = Config()
    config.folder = None
    config.set("console.quiet", True)
    config.set("model", "complex")
    config._import("complex")
    config.set("lookup_embedder.dim", 128)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 1024)
    config.set("negative_sampling.num_samples.s", 128)
    config.set("negative_sampling.num_samples.o", 128)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.implementation", "batch")
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("random_seed.default", 13)
    config.set("valid.every", 0)
    config.set("tpu.sparse_updates", sparse)
    dataset = build_synthetic_dataset(
        config, num_entities=num_entities, num_relations=num_relations,
        num_triples=num_triples,
    )
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    sec, _, _ = measure_steps(job, steps=32, distinct_batches=4)
    print(json.dumps({
        "metric": f"train_triples_per_s_complex_negsamp_V{num_entities}",
        "value": round(job.batch_size / sec, 1),
        "unit": "triples/s/chip",
        "sparse_updates": bool(job._sparse_paths),
        "step_ms": round(sec * 1e3, 3),
    }))


if __name__ == "__main__":
    # `python bench_large_vocab.py [auto|on|off] [num_entities]`;
    # num_entities 1_887_436 gives a 0.9 GiB table — just under the
    # 1 GiB fused-scatter backend cap (tpu.sparse_scatter_limit_bytes),
    # the largest single-shard sparse configuration the chip can run
    sparse = sys.argv[1] if len(sys.argv) > 1 else "auto"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    main(sparse=sparse, num_entities=n)
