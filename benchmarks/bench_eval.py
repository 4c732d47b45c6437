"""Entity-ranking evaluation throughput (queries/s) at FB15k-237 scale,
generic chunked-masking path vs fused Pallas rank-count path."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(implementation: str, num_test=4096, dim=128):
    from kge_tpu import Config
    from kge_tpu.evaluation.eval import EvaluationJob
    from kge_tpu.models import KgeModel
    from bench import build_synthetic_dataset
    import jax

    config = Config()
    config.folder = None
    config.set("console.quiet", True)
    config.set("model", "complex")
    config._import("complex")
    config.set("lookup_embedder.dim", dim)
    config.set("job.type", "eval")
    config.set("eval.split", "test")
    config.set("eval.batch_size", 512)
    config.set("entity_ranking.implementation", implementation)
    config.set("entity_ranking.filter_splits", ["train", "valid", "test"])
    dataset = build_synthetic_dataset(config)
    dataset._triples["test"] = dataset._triples["train"][:num_test]
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    job = EvaluationJob.create(config, dataset, model=model)
    job.set_params(params, model.init_state())
    job.verbose = False
    # warmup (compile)
    job.triples = dataset._triples["test"][:512]
    job._is_prepared = False
    job._evaluate()
    # timed
    job.triples = dataset._triples["test"]
    t0 = time.perf_counter()
    job._evaluate()
    dt = time.perf_counter() - t0
    mrr = None
    for k, v in job.current_trace["epoch"].items():
        if k == "mean_reciprocal_rank_filtered":
            mrr = v
    return num_test / dt, mrr


def main():
    out = {}
    for impl in ("generic", "fused"):
        qps, mrr = run(impl)
        out[impl] = round(qps, 1)
        out[f"{impl}_mrr"] = round(mrr, 6)
    from roofline import eval_batch_bytes, eval_flops, roofline

    # per-query traffic: candidate table streams once per side per
    # 512-query batch
    sec_per_query = 1.0 / max(out["fused"], 1e-9)
    rl = roofline(
        eval_batch_bytes(14541, 128) / 512.0,
        eval_flops(14541, 128, 512) / 512.0,
        sec_per_query,
    )
    print(json.dumps({
        "metric": "eval_queries_per_s_complex_fb15k237_scale",
        "value": out["fused"],
        "unit": "queries/s/chip",
        "vs_baseline": round(out["fused"] / max(out["generic"], 1e-9), 3),
        "generic": out["generic"],
        "generic_mrr": out["generic_mrr"],
        "fused_mrr": out["fused_mrr"],
        **rl,
    }))


if __name__ == "__main__":
    main()
