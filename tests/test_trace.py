"""Trace reader + console-format tests."""

import os

import yaml

from kge_tpu import Config
from kge_tpu.utils.trace import Trace, format_trace_entry, get_metric


def _write_trace(tmp_path):
    path = os.path.join(tmp_path, "trace.yaml")
    entries = [
        {"job": "train", "scope": "epoch", "epoch": 1, "avg_loss": 2.0,
         "job_id": "b", "resumed_from_job_id": "a"},
        {"job": "train", "scope": "epoch", "epoch": 2, "avg_loss": 1.0,
         "job_id": "b", "resumed_from_job_id": "a"},
        {"job": "eval", "scope": "epoch", "epoch": 2,
         "mean_reciprocal_rank_filtered": 0.5, "hits_at_10": 0.7,
         "job_id": "b"},
        {"job": "train", "scope": "epoch", "epoch": 0, "avg_loss": 3.0,
         "job_id": "a"},
    ]
    with open(path, "w") as f:
        for e in entries:
            f.write(yaml.dump(e, default_flow_style=True,
                              width=float("inf")).strip() + "\n")
    return path


def test_filtering(tmp_path):
    path = _write_trace(str(tmp_path))
    trace = Trace(path)
    assert len(trace.entries) == 4
    assert len(trace.filter({"job": "train"})) == 3
    assert len(trace.filter({"job": "eval", "epoch": 2})) == 1


def test_grep_entries_and_job_chain(tmp_path):
    path = _write_trace(str(tmp_path))
    entries = Trace.grep_entries(path, ["job: train", "scope: epoch"])
    assert len(entries) == 3
    # resumed-job chain: job b resumed from a -> include a's entries first
    chain, job_epochs = Trace.grep_training_trace_entries(
        path, train=True, job_id="b"
    )
    assert [e["epoch"] for e in chain] == [0, 1, 2]
    # a's epochs beyond b's resume point (epoch 1 - 1 = 0) are overlap
    assert job_epochs["a"] == 0
    assert job_epochs["b"] == float("inf")


def test_get_metric():
    entry = {"hits_at_10": 0.7, "mean_rank": 3}
    assert get_metric(entry, "hits_at_10") == 0.7
    assert get_metric(entry, "hits@10") == 0.7


def test_format_trace_entry():
    config = Config()
    config.set(
        "console.format",
        {"train_epoch": "f\"epoch={epoch} loss={avg_loss:.2f}\""},
        create=True,
    )
    line = format_trace_entry(
        "train_epoch", {"epoch": 3, "avg_loss": 1.234}, config
    )
    assert line == "epoch=3 loss=1.23"
    assert format_trace_entry("eval_epoch", {}, config) is None
