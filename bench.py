"""Headline benchmark: KGE training throughput (triples/s) on one chip.

Workload: ComplEx, FB15k-237-scale synthetic graph (14541 entities, 237
relations, dim 128), negative-sampling training with 128 shared negatives
per slot and batch 1024 — the shape of the reference's large-scale recipe
(reference README: Wikidata5M/Yago3-10 configs use shared NegSamp,
dim 128, batch 1024, Adagrad).

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is reported against a fixed reference point of 20k triples/s
(a PyTorch V100-class figure for this workload in LibKGE-style loops);
higher is better.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


REFERENCE_TRIPLES_PER_S = 20_000.0


def build_synthetic_dataset(config, num_entities=14541, num_relations=237,
                            num_triples=272115, seed=0):
    from kge_tpu import Dataset

    rng = np.random.default_rng(seed)
    triples = np.stack(
        [
            rng.integers(num_entities, size=num_triples),
            rng.integers(num_relations, size=num_triples),
            rng.integers(num_entities, size=num_triples),
        ],
        axis=1,
    ).astype(np.int32)
    config.set("dataset.num_entities", num_entities)
    config.set("dataset.num_relations", num_relations)
    config.set("dataset.pickle", False)
    dataset = Dataset(config, folder=None)
    dataset._triples["train"] = triples
    dataset._triples["valid"] = triples[:1000]
    dataset._triples["test"] = triples[:1000]
    return dataset


def main():
    from kge_tpu import Config
    from kge_tpu.train.train import TrainingJob
    import jax
    import jax.numpy as jnp

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
    import os as _os
    if _os.environ.get("KGE_TPU_LOOKUP"):
        config.set("tpu.embedding_lookup", _os.environ["KGE_TPU_LOOKUP"])
    config.set("random_seed.default", 13)
    config.set("valid.every", 0)

    dataset = build_synthetic_dataset(config)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    from harness import measure_steps

    sec_per_step, _ = measure_steps(job, steps=64, distinct_batches=8)
    triples_per_s = job.batch_size / sec_per_step
    from roofline import negsamp_step_bytes, negsamp_step_flops, roofline

    rl = roofline(
        negsamp_step_bytes(dataset.num_entities(), dataset.num_relations(),
                           128, job.batch_size, 128),
        negsamp_step_flops(128, job.batch_size, 128),
        sec_per_step,
    )
    print(json.dumps({
        "metric": "train_triples_per_s_complex_negsamp_fb15k237_scale",
        "value": round(triples_per_s, 1),
        "unit": "triples/s/chip",
        "vs_baseline": round(triples_per_s / REFERENCE_TRIPLES_PER_S, 3),
        **rl,
    }))


if __name__ == "__main__":
    main()
