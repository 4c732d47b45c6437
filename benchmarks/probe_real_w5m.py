"""Bisect the w5m sparse-step crash in the REAL job: run the actual
TrainingJob sparse step at Wikidata5M scale with individual features
toggled, one variant per process.

Usage: python probe_real_w5m.py VARIANT
  default        — the shipping config (crashes as of round 5)
  no_fused_loss  — tpu.fused_negsamp_loss=never (XLA loss instead of
                   the Pallas kernel, same scatters)
  no_donate      — tpu.donate_buffers=false
  dense          — tpu.sparse_updates=never (round-2 reliable regime)
"""

import json
import sys
import time


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "default"
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/benchmarks")
    from bench import _negsamp_config, build_synthetic_dataset
    from kge_tpu.train.train import TrainingJob
    import jax
    import jax.numpy as jnp

    config = _negsamp_config(128)
    if variant == "no_fused_loss":
        config.set("tpu.fused_negsamp_loss", "never")
    elif variant == "no_donate":
        config.set("tpu.donate_buffers", False)
    elif variant == "dense":
        config.set("tpu.sparse_updates", "never")
    dataset = build_synthetic_dataset(
        config, num_entities=4_818_679, num_relations=828,
        num_triples=500_000,
    )
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True

    step = job._build_train_step()
    gen = job._generate_batches(1)
    dev_batches = [
        {k: jnp.asarray(v) for k, v in next(gen).items()} for _ in range(4)
    ]
    lrs = {g: jnp.asarray(b, dtype=jnp.float32)
           for g, b in job.optimizer.base_lrs.items()}
    rng = jax.random.PRNGKey(7)
    params, opt_state, state = job.params, job.opt_state, job.model_state
    # warmup
    for i in range(2):
        params, opt_state, state, metrics = step(
            params, opt_state, state, dev_batches[i % 4], lrs,
            jax.random.fold_in(rng, i),
        )
    float(metrics["avg_loss"])
    t0 = time.perf_counter()
    n = 8
    for i in range(n):
        params, opt_state, state, metrics = step(
            params, opt_state, state, dev_batches[i % 4], lrs,
            jax.random.fold_in(rng, 2 + i),
        )
    loss = float(metrics["avg_loss"])
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "variant": variant, "step_ms": round(dt * 1e3, 2),
        "loss": round(loss, 4), "survived": True,
        "sparse": bool(job._sparse_paths),
    }), flush=True)


if __name__ == "__main__":
    main()
