"""Re-probe canaries for the platform-gated in-place sparse forms.

Four config knobs ship with ``auto == never`` because their big-table
programs crash the current remote-attached v5e worker
(docs/STATUS.md rounds 4-5): ``tpu.sparse_row_kernel``,
``tpu.sparse_pipelined_gather``, ``tpu.sparse_split_phases``,
``tpu.sparse_group_rowset``. Each
canary here forces one knob ``always`` in the REAL training job at an
over-limit table scale (1.2 GiB) in a SUBPROCESS (a worker crash kills
the process, not the suite) and REPORTS the outcome — it does not fail
on a crash, because the crash is the documented status quo; it fails
only on unexpected errors (wrong config plumbing, import errors).

Re-probe procedure (each round, and after any runtime update):

    python -m pytest tests/test_tpu_canary.py -m tpu -s

and record the three ``CANARY <knob>: ...`` lines in docs/STATUS.md.
When a knob reports SURVIVED on the real chip across repeated runs,
flip its ``auto`` gate in train_negative_sampling.py / config docs.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANARY_CODE = """
import sys
import jax
assert jax.default_backend() != "cpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from bench import _negsamp_config, build_synthetic_dataset
from kge_tpu.train.train import TrainingJob

config = _negsamp_config(128)
config.set("train.batch_size", 256)
config.set("negative_sampling.num_samples.s", 32)
config.set("negative_sampling.num_samples.o", 32)
config.set("tpu.{knob}", "always")
dataset = build_synthetic_dataset(
    config, num_entities=2_400_000, num_relations=101,
    num_triples=100_000,
)
job = TrainingJob.create(config, dataset)
job._prepare()
job._is_prepared = True
assert job._sparse_paths, "sparse updates did not engage"
lrs = {{g: jnp.asarray(b, dtype=jnp.float32)
       for g, b in job.optimizer.base_lrs.items()}}
rng = jax.random.PRNGKey(7)
params, opt_state, state = job.params, job.opt_state, job.model_state
gen = job._generate_batches(1)
if "{knob}" == "sparse_group_rowset":
    # the rowset form lives in the GROUP step
    assert job._use_group_rowset()
    k = 4
    stacked_np = job._stack_group_batches([next(gen) for _ in range(k)])
    stacked = {{kk: jnp.asarray(v) for kk, v in stacked_np.items()}}
    group = job._build_group_step(k)
    for r in range(2):
        params, opt_state, state, metrics = group(
            params, opt_state, state, stacked, lrs, rng,
            jnp.int32(r * k),
        )
        loss = float(metrics["avg_loss"][-1])
else:
    step = job._build_train_step()
    batches = [{{k: jnp.asarray(v) for k, v in next(gen).items()}}
               for _ in range(2)]
    for i in range(4):
        params, opt_state, state, metrics = step(
            params, opt_state, state, batches[i % 2], lrs,
            jax.random.fold_in(rng, i),
        )
        loss = float(metrics["avg_loss"])  # force every step
    if hasattr(step, "flush_pipeline"):
        params, opt_state = step.flush_pipeline(params, opt_state, lrs)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
print("CANARY-SURVIVED loss=%.4f" % loss)
"""


@pytest.mark.tpu
@pytest.mark.parametrize("knob", [
    "sparse_row_kernel", "sparse_pipelined_gather", "sparse_split_phases",
    "sparse_group_rowset",
])
def test_inplace_form_canary(knob):
    """Forces one gated in-place form on the real chip at over-limit
    table scale and prints its survival status. Passes on both SURVIVED
    and the known worker-crash signatures; fails on anything else."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-c", CANARY_CODE.format(repo=REPO, knob=knob)],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    if ("assert jax.default_backend()" in r.stderr and r.returncode != 0
            and "AssertionError" in r.stderr):
        pytest.skip("no TPU backend available")
    if r.returncode == 0 and "CANARY-SURVIVED" in r.stdout:
        print(f"\nCANARY {knob}: SURVIVED — consider flipping its auto "
              "gate (docs/STATUS.md re-probe procedure)")
        return
    tail = (r.stderr or "").strip().splitlines()
    brief = tail[-1][:200] if tail else "no output"
    known = any(sig in (r.stderr or "") for sig in (
        "FAILED_PRECONDITION", "UNAVAILABLE", "INTERNAL",
        "crashed or restarted",
    ))
    print(f"\nCANARY {knob}: CRASHED ({brief})")
    assert known, (
        f"canary for {knob} failed with an UNEXPECTED error (not the "
        f"characterized worker crash): {r.stderr[-2000:]}"
    )
