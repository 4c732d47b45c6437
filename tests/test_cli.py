"""End-to-end CLI tests: start -> resume -> test -> dump -> package."""

import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=300, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "kge_tpu"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
        **kw
    )


@pytest.fixture(scope="module")
def trained_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("toy-run"))
    os.rmdir(folder)
    r = _run([
        "start", "examples/toy-complex-train.yaml",
        "--folder", folder,
        "--job.device", "cpu",
        "--train.max_epochs", "2",
        "--valid.every", "2",
        "--lookup_embedder.dim", "16",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    return folder


def test_start_creates_artifacts(trained_folder):
    assert os.path.isfile(os.path.join(trained_folder, "config.yaml"))
    assert os.path.isfile(os.path.join(trained_folder, "trace.yaml"))
    assert os.path.isfile(os.path.join(trained_folder, "kge.log"))
    assert os.path.isfile(
        os.path.join(trained_folder, "checkpoint_00002.pt")
    )
    assert os.path.isfile(os.path.join(trained_folder, "checkpoint_best.pt"))


def test_resume_continues(trained_folder):
    r = _run([
        "resume", trained_folder,
        "--job.device", "cpu",
        "--train.max_epochs", "3",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isfile(
        os.path.join(trained_folder, "checkpoint_00003.pt")
    )


def test_eval_test_split(trained_folder):
    r = _run(["test", trained_folder, "--job.device", "cpu"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mean_reciprocal_rank_filtered" in r.stdout


def test_dump_trace_and_config(trained_folder):
    r = _run(["dump", "trace", trained_folder])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch" in r.stdout.splitlines()[0]
    r = _run(["dump", "config", trained_folder, "--minimal"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "model: complex" in r.stdout
    r = _run([
        "dump", "checkpoint",
        os.path.join(trained_folder, "checkpoint_best.pt"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "parameter_names" in r.stdout


def test_dump_trace_resume_chain(trained_folder):
    """A resume-of-resume folder dumps ONE continuous epoch series: each
    resumed job's entries follow its predecessor's, with the
    predecessor's re-trained epochs dropped (reference
    kge/util/dump.py:284-595 chain walk)."""
    # second resume hop (test_resume_continues did the first, to epoch 3)
    r = _run([
        "resume", trained_folder,
        "--job.device", "cpu",
        "--train.max_epochs", "5",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    r = _run(["dump", "trace", trained_folder, "--train"])
    assert r.returncode == 0, r.stderr[-2000:]
    import csv
    import io
    rows = list(csv.DictReader(io.StringIO(r.stdout)))
    train_epochs = [int(row["epoch"]) for row in rows]
    assert train_epochs == [1, 2, 3, 4, 5], train_epochs
    # three distinct jobs contributed to the stitched series
    assert len({row["job_id"] for row in rows}) == 3


def test_package_and_load(trained_folder):
    out = os.path.join(trained_folder, "model.pt")
    r = _run([
        "package", os.path.join(trained_folder, "checkpoint_best.pt"),
        "--file", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isfile(out)
    # loadable for applications
    from kge_tpu.utils.io import load_checkpoint
    from kge_tpu.models import KgeModel
    import jax.numpy as jnp
    import numpy as np

    checkpoint = load_checkpoint(out)
    model, params, state = KgeModel.create_from(checkpoint)
    scores = model.score_sp(params, jnp.asarray([0]), jnp.asarray([0]))
    assert np.asarray(scores).shape == (1, model.dataset.num_entities())


def test_dump_trace_chain_drops_retrained_eval_entries(tmp_path, capsys):
    """A predecessor's validation entries for epochs its successor
    RE-TRAINED must drop with the train entries (reference
    kge/util/dump.py:442-448), not linger as duplicate epoch rows."""
    import argparse

    import yaml as _yaml

    from kge_tpu.utils.dump import dump_trace

    lines = []

    def ent(**kw):
        lines.append(_yaml.dump(
            kw, default_flow_style=True, width=float("inf")).strip())

    for ep in range(1, 6):
        ent(job="train", job_id="A", scope="epoch", epoch=ep, avg_loss=0.1)
        ent(job="eval", job_id=f"AV{ep}", parent_job_id="A", scope="epoch",
            epoch=ep, split="valid", mean_reciprocal_rank=0.5)
    for ep in range(4, 6):
        ent(job="train", job_id="B", scope="epoch", epoch=ep, avg_loss=0.2,
            resumed_from_job_id="A")
        ent(job="eval", job_id=f"BV{ep}", parent_job_id="B", scope="epoch",
            epoch=ep, split="valid", mean_reciprocal_rank=0.6)
    trace = tmp_path / "trace.yaml"
    trace.write_text("\n".join(lines) + "\n")
    args = argparse.Namespace(
        source=str(trace), job_id="B", train=True, valid=True, test=False,
        search=False, yaml=True, keysfile=None, keys=None, max_epoch=None,
        example=False, batch=False, checkpoint=False, truncate=False,
        no_header=False, no_default_keys=False, list_keys=False,
    )
    dump_trace(args)
    out = [_yaml.safe_load(ln)
           for ln in capsys.readouterr().out.strip().splitlines()]
    trains_a = [e["epoch"] for e in out
                if e.get("job") == "train" and e.get("job_id") == "A"]
    evals_a = [e["epoch"] for e in out
               if e.get("job") == "eval" and e.get("parent_job_id") == "A"]
    evals_b = [e["epoch"] for e in out
               if e.get("job") == "eval" and e.get("parent_job_id") == "B"]
    assert sorted(trains_a) == [1, 2, 3]
    assert sorted(evals_a) == [1, 2, 3], evals_a
    assert sorted(evals_b) == [4, 5]


@pytest.mark.slow
def test_search_protocol_via_cli(tmp_path):
    """The reference's primary workflow end-to-end through the CLI
    (SURVEY call stack 3.4): kge start <grid search> runs every trial,
    then the best trial folder supports kge test and kge dump trace
    aggregates the search folder."""
    import glob

    cfg = tmp_path / "search.yaml"
    cfg.write_text(
        "job.type: search\n"
        "search.type: grid_search\n"
        "dataset.name: toy\n"
        "model: complex\n"
        "job.device: cpu\n"
        "lookup_embedder.dim: 8\n"
        "train: {max_epochs: 1, batch_size: 64}\n"
        "valid: {every: 1, metric: mean_reciprocal_rank_filtered}\n"
        "grid_search.parameters:\n"
        "  train.optimizer.default.args.lr: [0.1, 0.3]\n"
    )
    folder = str(tmp_path / "search-run")
    r = _run(["start", str(cfg), "--folder", folder], timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    trials = sorted(
        os.path.dirname(p) for p in
        glob.glob(os.path.join(folder, "*", "checkpoint_best.pt"))
    )
    assert len(trials) == 2, trials
    r = _run(["test", trials[0], "--job.device", "cpu"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mean_reciprocal_rank_filtered" in r.stdout
    r = _run(["dump", "trace", folder, "--search"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(r.stdout.strip().splitlines()) >= 2
    # resuming the SEARCH folder itself must work even though it holds no
    # checkpoint of its own (reference kge/util/io.py:7-33 returns None ->
    # job recreated from config; trials re-collected, not retrained)
    mtime = os.path.getmtime(os.path.join(trials[0], "checkpoint_best.pt"))
    r = _run(["resume", folder], timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "search_completed" in r.stdout
    assert os.path.getmtime(
        os.path.join(trials[0], "checkpoint_best.pt")
    ) == mtime, "resume retrained an already-finished trial"


def test_checkpoint_last_flag(trained_folder):
    """--checkpoint last resolves to the newest numbered checkpoint
    (the CLI help promises it; no checkpoint_last.pt file exists)."""
    r = _run(["valid", trained_folder, "--job.device", "cpu",
              "--checkpoint", "last"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mean_reciprocal_rank" in r.stdout


def test_unknown_cli_key_rejected(trained_folder):
    """A typo'd --key must error, not silently create a new config key
    (reference CLI rejects unknown keys)."""
    r = _run(["test", trained_folder, "--job.device", "cpu",
              "--train.batchsize", "128"])
    assert r.returncode != 0
    assert "batchsize" in (r.stderr + r.stdout)
