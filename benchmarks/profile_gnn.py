"""Component profile of the full-graph GNN train step (VERDICT r3 item
4 / r4 item 3): where do the milliseconds of the ~27 ms CompGCN step
go? Times each component as its own scanned program (same honest-timing
protocol as harness.measure_steps — the remote tunnel acks dispatches
early, so every measurement scans N iterations inside one program and
forces a scalar fetch).

Components:
  step        — the full train step (loss fwd+bwd + optimizer)
  encode_fwd  — encoder forward only (full-graph message passing)
  encode_bwd  — encoder forward + backward (grad wrt params)
  decoder     — the decoder-side loss fwd+bwd on FIXED encodings (what
                remains when message passing is free)
  dense_opt   — optimizer update alone on zero grads

Optionally writes a jax.profiler device trace (--trace DIR) for op-level
inspection when the backend supports it.

Usage: python profile_gnn.py [model] [--trace DIR]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")


def _timed_scan(fn, args, steps=16, label=""):
    """Scan fn(*args) `steps` times inside one jit and force a scalar."""
    import jax
    import jax.numpy as jnp

    def many(args):
        def body(carry, i):
            out = fn(*args, i)
            return carry + out, 0.0

        total, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(steps))
        return total

    j = jax.jit(many)
    t = float(j(args))  # compile + run
    t0 = time.perf_counter()
    t = float(j(args))
    dt = (time.perf_counter() - t0) / steps
    return dt


def profile(model="compgcn", dim=200, steps=16):
    import jax
    import jax.numpy as jnp
    from bench import build_synthetic_dataset
    from bench_gnn import GNN_DIM_KEYS
    from kge_tpu import Config
    from kge_tpu.models import Ctx
    from kge_tpu.train.train import TrainingJob
    from harness import measure_steps

    config = Config()
    config.folder = None
    config.set("console.quiet", True)
    config.set("model", model)
    config._import(model)
    for key in GNN_DIM_KEYS:
        config.set(key.format(m=model), dim, create=True)
    if model == "rgcn":
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
    dataset = build_synthetic_dataset(config, 14541, 237, 272115)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True

    out = {"model": model, "dim": dim}
    m = job.model
    params = job.params
    encoder = m.get_rgnn_encoder()

    # full step (the bench number)
    sec, _, _ = measure_steps(job, steps=steps, distinct_batches=4)
    out["step_ms"] = round(sec * 1e3, 2)
    params = job.params  # measure_steps trained/donated them

    rng = jax.random.PRNGKey(0)
    model_state = job.model_state  # BN running stats etc.

    def enc_fwd(params, i):
        ctx = Ctx(train=True, rng=jax.random.fold_in(rng, i),
                  state=model_state)
        x, r = encoder.encode(params, ctx)
        return jnp.sum(x) + jnp.sum(r)

    out["encode_fwd_ms"] = round(
        _timed_scan(enc_fwd, (params,), steps) * 1e3, 2
    )

    def enc_bwd(params, i):
        g = jax.grad(lambda p: enc_fwd(p, i))(params)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))

    out["encode_fwd_bwd_ms"] = round(
        _timed_scan(enc_bwd, (params,), steps) * 1e3, 2
    )

    # decoder side: loss fwd+bwd with the ENCODER OUTPUT held constant
    # (gradients flow to the decoder inputs but not through message
    # passing) — approximates the step cost if message passing were free
    gen = job._generate_batches(1)
    batch = {k: jnp.asarray(v) for k, v in next(gen).items()}
    ctx0 = Ctx(train=True, rng=rng, state=model_state)
    x0, r0 = encoder.encode(params, ctx0)
    # seed the stale-embedding memo so the loss consumes FIXED encodings
    encoder.use_stale_embeddings = True
    cache_key = f"{encoder.configuration_key}.encoded"

    def dec_only(params, x0, r0, i):
        def loss_fn(xr):
            ctx = Ctx(train=True, rng=jax.random.fold_in(rng, i),
                      state=model_state)
            ctx.cache[cache_key] = xr
            return job._subbatch_loss(
                params, ctx, batch, slice(0, job.batch_size)
            )

        loss, g = jax.value_and_grad(loss_fn)((x0, r0))
        return loss + jnp.sum(g[0]) + jnp.sum(g[1])

    try:
        out["decoder_ms"] = round(
            _timed_scan(dec_only, (params, x0, r0), steps) * 1e3, 2
        )
    except Exception as e:
        out["decoder_error"] = repr(e)[:200]
    finally:
        encoder.use_stale_embeddings = False
    return out


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "compgcn"
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
    if trace_dir:
        import jax

        jax.profiler.start_trace(trace_dir)
    out = profile(model)
    if trace_dir:
        import jax

        jax.profiler.stop_trace()
        out["trace_dir"] = trace_dir
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
