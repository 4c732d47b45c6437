"""Benchmark harness: honest step timing through remote TPU tunnels.

Some remote TPU transports make ``block_until_ready`` return at dispatch
time, so per-dispatch wall-clock only measures host overhead. This
harness scans N train steps inside ONE compiled program (cycling a small
set of pre-staged device batches) and forces a scalar fetch, so
``elapsed / N`` bounds the true device step time.
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np


def measure_steps(job, steps: int = 32, distinct_batches: int = 8,
                  repeats: int = 1):
    """Returns (seconds_per_step, final_loss, all_secs_per_step).

    ``repeats`` re-runs the timed measurement; seconds_per_step is the
    MEDIAN and ``all_secs_per_step`` carries every repeat, so callers
    can report a noise bar next to the throughput."""
    import jax
    import jax.numpy as jnp

    if getattr(job, "_sparse_host_loop_only", lambda: False)():
        # sparse steps over the scatter limit must not scan (the carry
        # would make the row scatters in-place on multi-GiB buffers —
        # the v5e platform fault); time the real per-dispatch host loop
        return _measure_pipelined_steps(job, steps, distinct_batches,
                                        repeats)

    gen = job._generate_batches(1)
    batch_list = [next(gen) for _ in range(distinct_batches)]
    # the job's OWN grouped-dispatch program (the structure run_epoch
    # dispatches, incl. strategy group-level payloads like the sparse
    # row working set), cycling the distinct batches to fill `steps`
    stacked_np = job._stack_group_batches(
        [batch_list[i % distinct_batches] for i in range(steps)]
    )
    stacked = {k: jnp.asarray(v) for k, v in stacked_np.items()}
    lrs = {g: jnp.asarray(b, dtype=jnp.float32)
           for g, b in job.optimizer.base_lrs.items()}
    fn = job._build_group_step(steps)
    rng = jax.random.PRNGKey(7)
    # warmup: compile + one full execution, forced by the scalar fetch
    params, opt_state, state, metrics = fn(
        job.params, job.opt_state, job.model_state, stacked, lrs, rng,
        jnp.int32(0),
    )
    float(metrics["avg_loss"][-1])
    # timed runs
    secs = []
    for r in range(max(1, repeats)):
        t0 = time.perf_counter()
        params, opt_state, state, metrics = fn(
            params, opt_state, state, stacked, lrs, rng,
            jnp.int32((1 + r) * steps),
        )
        # forces execution + scalar transfer
        final_loss = float(metrics["avg_loss"][-1])
        secs.append((time.perf_counter() - t0) / steps)
    job.params, job.opt_state, job.model_state = params, opt_state, state
    return sorted(secs)[len(secs) // 2], final_loss, secs


def _measure_pipelined_steps(job, steps: int, distinct_batches: int,
                             repeats: int = 1):
    """Pipelined split-sparse steps (two programs per step) cannot scan
    into one compiled dispatch; time the real host loop instead. The
    final scalar fetch forces the whole dependency chain, so
    ``elapsed / steps`` is an honest per-step bound that INCLUDES the
    per-step dispatch overhead a user pays."""
    import time as _time

    import jax
    import jax.numpy as jnp

    step = job._build_train_step()
    gen = job._generate_batches(1)
    dev_batches = [
        {k: jnp.asarray(v) for k, v in next(gen).items()}
        for _ in range(distinct_batches)
    ]
    lrs = {g: jnp.asarray(b, dtype=jnp.float32)
           for g, b in job.optimizer.base_lrs.items()}
    rng = jax.random.PRNGKey(7)
    params, opt_state, state = job.params, job.opt_state, job.model_state
    # warmup compiles all three programs (gather, loss, update+gather)
    for i in range(2):
        params, opt_state, state, metrics = step(
            params, opt_state, state, dev_batches[i % distinct_batches],
            lrs, jax.random.fold_in(rng, i),
        )
    float(metrics["avg_loss"])
    secs = []
    fold = 2
    for _ in range(max(1, repeats)):
        t0 = _time.perf_counter()
        for i in range(steps):
            params, opt_state, state, metrics = step(
                params, opt_state, state, dev_batches[i % distinct_batches],
                lrs, jax.random.fold_in(rng, fold + i),
            )
        final_loss = float(metrics["avg_loss"])  # forces the chain
        secs.append((_time.perf_counter() - t0) / steps)
        fold += steps
    if hasattr(step, "flush_pipeline"):
        params, opt_state = step.flush_pipeline(params, opt_state, lrs)
    job.params, job.opt_state, job.model_state = params, opt_state, state
    return sorted(secs)[len(secs) // 2], final_loss, secs
