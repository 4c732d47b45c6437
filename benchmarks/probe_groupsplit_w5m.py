"""Probe: dispatch-level row working set as THREE SEPARATE small
programs on the real job at Wikidata5M scale:

  load(k-group):  rows = gather(table, union)           [read-only]
  k x step:       loss/grads + row-space Adagrad on the small buffers
  store(k-group): table' = scatter-add(table, union, delta)  [UNDONATED]

No big buffer ever appears inside a large program (the crash surface of
rounds 4-5): the store is a standalone copying scatter with live input
buffers, so XLA cannot update in place. If this survives, the w5m step
cost becomes (2 table passes)/k + row work.

Usage: python probe_groupsplit_w5m.py [k] [batch]
"""

import json
import sys
import time


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/benchmarks")
    from bench import _negsamp_config, build_synthetic_dataset
    from kge_tpu.train.train import TrainingJob
    from kge_tpu.train.chunking import gather_rows, scatter_rows_add
    import jax
    import jax.numpy as jnp
    import numpy as np

    config = _negsamp_config(128)
    config.set("train.batch_size", batch)
    dataset = build_synthetic_dataset(
        config, num_entities=4_818_679, num_relations=828,
        num_triples=500_000,
    )
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    assert job._sparse_paths and job._table_chunks

    gen = job._generate_batches(1)
    group = [next(gen) for _ in range(k)]
    stacked_np = job._stack_group_batches(group)
    dev = {kk: jnp.asarray(v) for kk, v in stacked_np.items()}
    lrs = {g: jnp.asarray(b, dtype=jnp.float32)
           for g, b in job.optimizer.base_lrs.items()}
    rng = jax.random.PRNGKey(7)
    optimizer = job.optimizer
    apply_dense = job._dense_leaf_update()

    @jax.jit
    def load(params, opt_state, u_e, u_r):
        w_e = gather_rows(params["entity_embedder"]["weights"], u_e)
        w_r = gather_rows(params["relation_embedder"]["weights"], u_r)
        acc = opt_state["sparse"]
        a_e = gather_rows(acc["entity_embedder.weights"]["sum"], u_e)
        a_r = gather_rows(acc["relation_embedder.weights"]["sum"], u_r)
        return w_e, w_r, a_e, a_r

    def one_step(params, opt_state, model_state, w_e, a_e, w_r, a_r,
                 batch, lrs, rng):
        rows_e = jnp.take(w_e, batch["pos_e"], axis=0)
        rows_r = jnp.take(w_r, batch["pos_r"], axis=0)
        grads, model_state, metrics = job._sparse_loss_grads(
            rows_e, rows_r, params, model_state, batch, rng
        )
        params, opt_state = apply_dense(params, opt_state, grads, lrs)
        w_e, a_e = optimizer.sparse_rowset_update(
            "entity_embedder.weights", w_e, a_e, batch["pos_e"],
            grads["rows_e"], lrs,
        )
        w_r, a_r = optimizer.sparse_rowset_update(
            "relation_embedder.weights", w_r, a_r, batch["pos_r"],
            grads["rows_r"], lrs,
        )
        return params, opt_state, model_state, w_e, a_e, w_r, a_r, metrics

    step_j = jax.jit(one_step)

    @jax.jit
    def store(params, opt_state, u_e, u_r, dw_e, dw_r, da_e, da_r):
        new_e = scatter_rows_add(
            params["entity_embedder"]["weights"], u_e, dw_e
        )
        new_r = scatter_rows_add(
            params["relation_embedder"]["weights"], u_r, dw_r
        )
        params = {
            **params,
            "entity_embedder": {**params["entity_embedder"],
                                "weights": new_e},
            "relation_embedder": {**params["relation_embedder"],
                                  "weights": new_r},
        }
        sp = dict(opt_state["sparse"])
        sp["entity_embedder.weights"] = {"sum": scatter_rows_add(
            sp["entity_embedder.weights"]["sum"], u_e, da_e
        )}
        sp["relation_embedder.weights"] = {"sum": scatter_rows_add(
            sp["relation_embedder.weights"]["sum"], u_r, da_r
        )}
        return params, {**opt_state, "sparse": sp}

    params, opt_state, model_state = (job.params, job.opt_state,
                                      job.model_state)
    per_batch = {kk: v for kk, v in dev.items()
                 if not kk.startswith("guniq_")}
    u_e, u_r = dev["guniq_e"], dev["guniq_r"]

    def run_group(params, opt_state, model_state, fold0):
        w_e, w_r, a_e, a_r = load(params, opt_state, u_e, u_r)
        w_e0, w_r0, a_e0, a_r0 = w_e, w_r, a_e, a_r
        for i in range(k):
            b = {kk: v[i] for kk, v in per_batch.items()}
            (params, opt_state, model_state,
             w_e, a_e, w_r, a_r, metrics) = step_j(
                params, opt_state, model_state, w_e, a_e, w_r, a_r, b,
                lrs, jax.random.fold_in(rng, fold0 + i),
            )
        params, opt_state = store(
            params, opt_state, u_e, u_r,
            w_e - w_e0, w_r - w_r0, a_e - a_e0, a_r - a_r0,
        )
        return params, opt_state, model_state, metrics

    # warmup (compiles all three programs)
    params, opt_state, model_state, metrics = run_group(
        params, opt_state, model_state, 0
    )
    float(metrics["avg_loss"])
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        params, opt_state, model_state, metrics = run_group(
            params, opt_state, model_state, (1 + r) * k
        )
    loss = float(metrics["avg_loss"])
    dt = (time.perf_counter() - t0) / (reps * k)
    print(json.dumps({
        "k": k, "batch": batch, "step_ms": round(dt * 1e3, 3),
        "triples_per_s": round(batch / dt, 1),
        "loss": round(loss, 4), "survived": True,
    }), flush=True)


if __name__ == "__main__":
    main()
