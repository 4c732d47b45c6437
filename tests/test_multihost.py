"""Multi-host training on a 2-process CPU cluster (the fake distributed
backend prescribed by SURVEY.md section 4): jax.distributed over
localhost, 2 virtual CPU devices per process, hybrid (data=2, model=2)
mesh whose data axis spans the two processes.

Parity contract: every process generates the identical global batch
(identical seeds), materializes only its addressable shards
(put_global), and the resulting loss trajectory must match a
single-process run of the same config on a local 4-device mesh bit for
bit (same GSPMD program, CPU determinism)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.util import create_config, get_dataset_folder

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_losses(model_name="complex"):
    """Same config as the workers, on a single-process 2x2 mesh."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    from tests.multihost_worker import configure_model

    config = create_config("dataset_test", model=model_name)
    config.set("train.type", "negative_sampling")
    config.set("random_seed.default", 41)
    config.set("random_seed.numpy", 41)
    config.set("random_seed.jax", 41)
    configure_model(config, model_name)
    config.set("train.batch_size", 16)
    config.set("train.max_epochs", 2)
    config.set("valid.every", 2)
    config.set("eval.batch_size", 16)
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("tpu.mesh.data", 2)
    config.set("tpu.mesh.model", 2)
    config.set("tpu.steps_per_dispatch", 1)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    job = TrainingJob.create(config, dataset)
    losses = []
    job.post_epoch_hooks.append(
        lambda j: losses.append(float(j.current_trace["epoch"]["avg_loss"]))
    )
    job.run()
    mrr = job.valid_trace[-1]["mean_reciprocal_rank_filtered"]
    return losses, mrr


@pytest.mark.slow
def test_two_process_cpu_cluster_matches_single_process(tmp_path):
    port = _free_port()
    outdir = str(tmp_path)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker",
             str(pid), "2", str(port), outdir],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"loss_{pid}.json")) as f:
            results.append(json.load(f))
    assert results[0]["process_count"] == 2
    # both processes observe the identical (replicated-metric) trajectory
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=0, atol=0
    )

    # shared folder: checkpoints written once (by process 0), non-primary
    # logs diverted to proc1/; resume succeeded on both processes
    shared = os.path.join(outdir, "shared_folder")
    assert any(n.startswith("checkpoint") for n in os.listdir(shared))
    assert os.path.isdir(os.path.join(shared, "proc1"))
    assert os.path.isfile(os.path.join(shared, "proc1", "kge.log"))
    assert all(r["resumed_epoch"] == 3 for r in results)

    single, single_mrr = _single_process_losses()
    np.testing.assert_allclose(results[0]["losses"], single, rtol=1e-6)
    # eval (entity ranking) also ran under the 2-process mesh: its
    # fetch_global count arrays must reproduce the single-process MRR
    assert results[0]["valid_mrr"] is not None
    np.testing.assert_allclose(results[0]["valid_mrr"], single_mrr,
                               rtol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["compgcn", "ragat"])
def test_two_process_gnn_halo_matches_single_process(tmp_path, model_name):
    """GNN models on the 2-process hybrid mesh: the edge-partitioned
    halo paths (CompGCN: hoisted-payload rowblock aggregation; RAGAT:
    raw-embedding gather-table exchange + shard-local attention
    softmax) must engage under jax.distributed and reproduce the
    single-process 2x2-mesh loss trajectory."""
    port = _free_port()
    outdir = str(tmp_path)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker",
             str(pid), "2", str(port), outdir, model_name],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"loss_{pid}.json")) as f:
            results.append(json.load(f))
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=0, atol=0
    )
    single, _ = _single_process_losses(model_name)
    np.testing.assert_allclose(results[0]["losses"], single, rtol=1e-5)
