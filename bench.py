"""Headline benchmark: KGE training throughput (triples/s) on one chip,
measured in BOTH regimes the machine can be in:

- FB15k-237 scale (14541 entities, 7 MB table): dispatch/op-latency
  bound — the regime of the reference's most-published configs.
- Wikidata5M scale (4.8M entities, 2.3 GiB table): HBM-bandwidth bound
  (dense Adagrad table passes dominate) — the regime that stresses the
  chip; `w5m_pct_hbm_roofline` is the honest hardware-utilization
  number.

Workload for both: ComplEx dim 128, negative-sampling training with
128 shared negatives per slot and batch 1024 — the shape of the
reference's large-scale recipe (reference README: Wikidata5M/Yago3-10
configs use shared NegSamp, dim 128, batch 1024, Adagrad).

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is reported against a fixed reference point of 20k
triples/s (a PyTorch V100-class figure for this workload in
LibKGE-style loops); higher is better.

Prints ONE JSON line: the FB15k-237 headline metric plus w5m_* fields
for the bandwidth-bound regime.
"""

import json
import os
import sys
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


def _negsamp_config(dim=128):
    from kge_tpu import Config

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
    if os.environ.get("KGE_TPU_LOOKUP"):
        config.set("tpu.embedding_lookup", os.environ["KGE_TPU_LOOKUP"])
    config.set("random_seed.default", 13)
    config.set("valid.every", 0)
    return config


def bench_negsamp(num_entities, num_relations, num_triples, steps,
                  distinct_batches, dim=128):
    """(sec_per_step, roofline dict) for one NegSamp training shape."""
    from kge_tpu.train.train import TrainingJob
    from harness import measure_steps
    from roofline import (
        negsamp_sparse_step_bytes, negsamp_step_bytes, negsamp_step_flops,
        roofline,
    )

    config = _negsamp_config(dim)
    dataset = build_synthetic_dataset(
        config, num_entities=num_entities, num_relations=num_relations,
        num_triples=num_triples,
    )
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    sec_per_step, _ = measure_steps(
        job, steps=steps, distinct_batches=distinct_batches
    )
    if job._sparse_paths:
        # sparse regime: the honest byte model counts TOUCHED rows, not
        # table passes (VERDICT r3 item 1)
        rows_e, rows_r = job._touched_row_counts()
        step_bytes = negsamp_sparse_step_bytes(
            rows_e, rows_r, dim, job.batch_size, 128
        )
    else:
        step_bytes = negsamp_step_bytes(
            num_entities, num_relations, dim, job.batch_size, 128
        )
    rl = roofline(
        step_bytes,
        negsamp_step_flops(dim, job.batch_size, 128),
        sec_per_step,
    )
    rl["sparse_updates"] = bool(job._sparse_paths)
    return job.batch_size / sec_per_step, sec_per_step, rl


def _require_tpu_or_die(timeout_s: float = 180.0):
    """Fail fast if the TPU tunnel is wedged: backend init over the
    tunnel can block INDEFINITELY (not error) when the remote side is
    down, which would hang the whole bench run. Probe device discovery
    on a daemon thread and exit non-zero on timeout so callers see a
    clear failure instead of a stall."""
    import threading

    result = {}

    def probe():
        import jax

        try:
            result["devices"] = jax.devices()
        except Exception as e:  # surfaced below
            result["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(
            f"bench: TPU backend init did not complete within "
            f"{timeout_s:.0f}s (tunnel down or busy); aborting",
            file=sys.stderr,
        )
        os._exit(3)
    if "error" in result:
        print(f"bench: TPU backend init failed: {result['error']}",
              file=sys.stderr)
        os._exit(3)


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    _require_tpu_or_die()

    # regime 1: FB15k-237 scale (latency-bound; most-published configs)
    fb_tps, fb_sec, fb_rl = bench_negsamp(
        num_entities=14541, num_relations=237, num_triples=272115,
        steps=64, distinct_batches=8,
    )

    # regime 2: Wikidata5M scale (bandwidth-bound; 2.3 GiB entity table,
    # dense Adagrad passes dominate). Fewer steps: each one moves ~14 GB.
    # Guarded: a failure here must not lose the headline metric line.
    extras = {}
    try:
        w5m_tps, w5m_sec, w5m_rl = bench_negsamp(
            num_entities=4_818_679, num_relations=828, num_triples=500_000,
            steps=16, distinct_batches=4,
        )
        extras.update({
            "w5m_train_triples_per_s": round(w5m_tps, 1),
            "w5m_step_ms": round(w5m_sec * 1e3, 2),
            "w5m_achieved_GBps": w5m_rl["achieved_GBps"],
            "w5m_pct_hbm_roofline": w5m_rl["pct_hbm_roofline"],
            "w5m_entity_table_GiB": round(4_818_679 * 128 * 4 / 2 ** 30, 2),
        })
    except Exception as e:
        print(f"bench: W5M section skipped: {e!r}", file=sys.stderr)

    # end-to-end epoch loop at FB15k-237 scale (host collate + transfer
    # + grouped dispatch + compiled steps): the number a user's wall
    # clock sees, where host-side batch prep can hide the device's
    # speed. Same guard.
    try:
        from bench_epoch import measure as measure_epoch

        ep = measure_epoch(group=4)
        extras.update({
            "e2e_epoch_triples_per_s": ep["value"],
            "e2e_ms_per_batch": ep["ms_per_batch"],
        })
    except Exception as e:
        print(f"bench: epoch section skipped: {e!r}", file=sys.stderr)

    # entity-ranking eval throughput, BOTH paths (generic chunked vs
    # fused Pallas) with an HBM roofline anchor and a w5m-scale fused
    # number (2.3 GiB candidate table). Same guard.
    try:
        from bench_eval import measure as measure_eval

        ev = measure_eval()
        extras.update({
            "eval_queries_per_s": ev["eval_queries_per_s_fused"],
            "eval_queries_per_s_generic": ev["eval_queries_per_s_generic"],
            "eval_pct_hbm_roofline": ev["eval_pct_hbm_roofline"],
            "eval_w5m_queries_per_s": ev["eval_w5m_queries_per_s_fused"],
            "eval_w5m_pct_hbm_roofline": ev["eval_w5m_pct_hbm_roofline"],
        })
    except Exception as e:
        print(f"bench: eval section skipped: {e!r}", file=sys.stderr)

    # regime 3: full-graph message passing for all three GNN layer
    # families (bandwidth-bound segment ops), same guard per family.
    from bench_gnn import measure as measure_gnn

    for fam in ("compgcn", "rgcn", "ragat"):
        try:
            g = measure_gnn(model=fam)
            if fam == "compgcn":
                extras.update({
                    "gnn_edges_per_s": g["value"],
                    "gnn_step_ms": g["step_ms"],
                    "gnn_pct_hbm_roofline": g["pct_hbm_roofline"],
                })
            else:
                extras.update({
                    f"gnn_{fam}_edges_per_s": g["value"],
                    f"gnn_{fam}_step_ms": g["step_ms"],
                })
        except Exception as e:
            print(f"bench: GNN {fam} section skipped: {e!r}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "train_triples_per_s_complex_negsamp_fb15k237_scale",
        "value": round(fb_tps, 1),
        "unit": "triples/s/chip",
        "vs_baseline": round(fb_tps / REFERENCE_TRIPLES_PER_S, 3),
        **fb_rl,
        **extras,
    }))


if __name__ == "__main__":
    main()
