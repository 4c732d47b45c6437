"""Message-passing throughput (edges/s) for the R-GNN encoders at
FB15k-237 scale: full-graph encode inside a real negative-sampling train
step (the BASELINE.json edges/s metric). All three layer families the
reference ships are driver-tracked — CompGCN (message passing), RGCN
(relation-stacked sparse conv) and RAGAT (attention heads) — so a
regression in any of them is visible in BENCH_r{N}.json
(reference workload: rgnn_encoder.py:1283-1303 full-graph forward)."""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


GNN_DIM_KEYS = (
    "{m}.entity_embedder.dim",
    "{m}.relation_embedder.dim",
    "{m}.decoder.base_model.entity_embedder.dim",
    "{m}.decoder.base_model.relation_embedder.dim",
)


def measure(model="compgcn", dim=200, num_entities=14541,
            num_relations=237, num_triples=272115, steps=16):
    """Compile + time one GNN family's train step; returns metric fields."""
    from kge_tpu import Config
    from kge_tpu.train.train import TrainingJob
    from bench import build_synthetic_dataset

    config = Config()
    config.folder = None
    config.set("console.quiet", True)
    config.set("model", model)
    config._import(model)
    for key in GNN_DIM_KEYS:
        config.set(key.format(m=model), dim, create=True)
    if model == "rgcn":
        # block decomposition needs dim % blocks == 0 (preset: 100)
        config.set("rgcn.encoder.num_blocks_or_bases", 4)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 1024)
    config.set("negative_sampling.num_samples.s", 64)
    config.set("negative_sampling.num_samples.o", 64)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.implementation", "batch")
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("random_seed.default", 5)
    config.set("valid.every", 0)
    config.set("tpu.matmul_precision", "high")

    dataset = build_synthetic_dataset(
        config, num_entities, num_relations, num_triples
    )
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True

    from harness import measure_steps

    sec_per_step, _, _ = measure_steps(job, steps=steps, distinct_batches=4)
    # the encoder touches every edge (x2 for inverses) per layer per step
    num_layers = config.get(f"{model}.encoder.num_layers")
    edges_per_step = num_triples * 2 * num_layers
    from roofline import gnn_step_bytes, roofline

    rl = roofline(
        gnn_step_bytes(num_triples * 2, dim, num_layers), 0.0, sec_per_step
    )
    rl.pop("GFLOPs_per_s")  # bandwidth-bound; FLOP side not modeled
    return {
        "metric": f"gnn_edges_per_s_{model}_fb15k237_scale",
        "value": round(edges_per_step / sec_per_step, 1),
        "unit": "edges/s/chip",
        "vs_baseline": 1.0,
        "step_ms": round(sec_per_step * 1e3, 2),
        "triples_per_s": round(job.batch_size / sec_per_step, 1),
        **rl,
    }


def main(**kwargs):
    print(json.dumps(measure(**kwargs)))


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "compgcn"
    main(model=model)
