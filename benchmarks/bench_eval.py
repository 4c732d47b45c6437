"""Entity-ranking evaluation throughput (queries/s), generic
chunked-masking path vs fused Pallas rank-count path, with an HBM
roofline anchor (bytes ≈ one candidate-table stream per batch side —
the protocol cost floor of reference eval_entity_ranking.py:216-231
chunked scoring) and a Wikidata5M-scale section where the candidate
table is the real 2.3 GiB case the fused path exists for."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(implementation: str, num_test=4096, dim=128, num_entities=14541,
        num_relations=237, batch_size=512):
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
    config.set("eval.batch_size", batch_size)
    config.set("entity_ranking.implementation", implementation)
    config.set("entity_ranking.filter_splits", ["train", "valid", "test"])
    dataset = build_synthetic_dataset(
        config, num_entities=num_entities, num_relations=num_relations,
        num_triples=max(num_test * 4, 65536),
    )
    dataset._triples["test"] = dataset._triples["train"][:num_test]
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    job = EvaluationJob.create(config, dataset, model=model)
    job.set_params(params, model.init_state())
    job.verbose = False
    # warmup (compile)
    job.triples = dataset._triples["test"][:batch_size]
    job._is_prepared = False
    job._evaluate()
    # timed
    job.triples = dataset._triples["test"]
    t0 = time.perf_counter()
    job._evaluate()
    dt = time.perf_counter() - t0
    mrr = job.current_trace["epoch"].get("mean_reciprocal_rank_filtered")
    return num_test / dt, mrr


def _roofline_fields(qps, num_entities, dim, batch_size, prefix=""):
    from roofline import eval_batch_bytes, eval_flops, roofline

    # per-query traffic: candidate table streams once per side per batch
    sec_per_query = 1.0 / max(qps, 1e-9)
    rl = roofline(
        eval_batch_bytes(num_entities, dim) / batch_size,
        eval_flops(num_entities, dim, batch_size) / batch_size,
        sec_per_query,
    )
    return {f"{prefix}{k}": v for k, v in rl.items()}


def measure():
    """All eval bench fields for bench.py's extras dict."""
    out = {}
    for impl in ("generic", "fused"):
        qps, mrr = run(impl)
        out[f"eval_queries_per_s_{impl}"] = round(qps, 1)
        out[f"eval_mrr_{impl}"] = round(mrr, 6)
    out.update(_roofline_fields(
        out["eval_queries_per_s_fused"], 14541, 128, 512, prefix="eval_"
    ))
    # w5m-scale: the 2.3 GiB candidate table is the fused path's whole
    # point — one table stream per side per 512-query batch is ~9.6 MB
    # of HBM traffic per query, so queries/s is bandwidth-anchored
    qps, _ = run("fused", num_test=1024, num_entities=4_818_679,
                 num_relations=828)
    out["eval_w5m_queries_per_s_fused"] = round(qps, 1)
    out.update(_roofline_fields(
        qps, 4_818_679, 128, 512, prefix="eval_w5m_"
    ))
    return out


def main():
    out = measure()
    print(json.dumps({
        "metric": "eval_queries_per_s_complex_fb15k237_scale",
        "value": out["eval_queries_per_s_fused"],
        "unit": "queries/s/chip",
        "vs_baseline": round(
            out["eval_queries_per_s_fused"]
            / max(out["eval_queries_per_s_generic"], 1e-9), 3),
        **out,
    }))


if __name__ == "__main__":
    main()
