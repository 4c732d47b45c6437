"""Search job tests: manual/grid/sobol search over the tiny fixture."""

import os

import numpy as np
import pytest

from kge_tpu import Config, Dataset
from kge_tpu.train.job import Job

from tests.util import get_dataset_folder
pytestmark = pytest.mark.slow  # 8-device / long-training tests; fast profile: -m 'not slow'


def _search_config(tmp_path, search_type):
    config = Config()
    config.set("model", "complex")
    config._import("complex")
    config.set("job.device", "cpu")
    config.set("job.type", "search")
    config.set("search.type", search_type)
    config.set("search.num_workers", 1)
    config.set("dataset.name", "dataset_test")
    config.set("train.type", "1vsAll")
    config.set("train.max_epochs", 2)
    config.set("train.batch_size", 4)
    config.set("valid.every", 2)
    config.set("valid.metric", "mean_reciprocal_rank_filtered")
    config.set("lookup_embedder.dim", 8)
    config.set("random_seed.default", 3)
    config.folder = str(tmp_path / search_type)
    os.makedirs(config.folder)
    config.init_folder()
    return config


def _dataset(config):
    return Dataset.create(config, get_dataset_folder("dataset_test"))


def test_manual_search(tmp_path):
    config = _search_config(tmp_path, "manual_search")
    config.set("manual_search.configurations", [
        {"folder": "lr01", "train.optimizer.default.args.lr": 0.1},
        {"folder": "lr05", "train.optimizer.default.args.lr": 0.5},
    ])
    job = Job.create(config, _dataset(config))
    result = job.run()
    assert result.get("best_trial") in (0, 1)
    for folder in ("lr01", "lr05"):
        assert os.path.isfile(
            os.path.join(config.folder, folder, "checkpoint_best.pt")
        )


def test_grid_search(tmp_path):
    config = _search_config(tmp_path, "grid_search")
    config.set("grid_search.parameters", {
        "train.optimizer.default.args.lr": [0.1, 0.3],
        "lookup_embedder.dim": [8],
    }, create=True)
    job = Job.create(config, _dataset(config))
    result = job.run()
    assert result.get("best_trial") is not None
    subfolders = [
        d for d in os.listdir(config.folder)
        if os.path.isdir(os.path.join(config.folder, d)) and d != "config"
    ]
    assert len(subfolders) == 2


def test_sobol_search_and_resume(tmp_path):
    config = _search_config(tmp_path, "ax_search")
    config.set("ax_search.num_trials", 3)
    config.set("ax_search.parameters", [
        {"name": "train.optimizer.default.args.lr", "type": "range",
         "bounds": [0.01, 1.0], "log_scale": True},
        {"name": "lookup_embedder.dim", "type": "choice", "values": [8, 16]},
    ])
    job = Job.create(config, _dataset(config))
    result = job.run()
    assert result.get("best_trial") is not None
    assert len(job.parameters) == 3
    # parameters landed within the search space
    for p in job.parameters:
        assert 0.01 <= p["train.optimizer.default.args.lr"] <= 1.0
        assert p["lookup_embedder.dim"] in (8, 16)
    # resume: same search regenerates the same arms and skips done trials
    config2 = Config()
    config2.load_options(
        {k: v for k, v in Config.flatten(config.options).items()
         if not k.startswith("import")},
        create=True,
    )
    config2.folder = config.folder
    job2 = Job.create(config2, _dataset(config))
    result2 = job2.run()
    assert [p for p in job2.parameters[:3]] == job.parameters


def test_gp_ei_phase_concentrates_near_optimum(tmp_path):
    """The native GP+EI refinement (no ax-platform) must propose points
    closer to a synthetic 1-d optimum than the Sobol phase did. Backend
    unit test: trial results are injected, no training runs."""
    from kge_tpu.search.ax import AxSearchJob

    config = _search_config(tmp_path, "ax_search")
    config.set("ax_search.num_trials", 24)
    config.set("ax_search.num_sobol_trials", 12)
    config.set("ax_search.parameters", [
        {"name": "train.optimizer.default.args.lr", "type": "range",
         "bounds": [0.0, 1.0]},
    ])
    job = AxSearchJob(config, _dataset(config))
    job.init_search()

    def objective(params):
        x = params["train.optimizer.default.args.lr"]
        return {"mean_reciprocal_rank_filtered": 1.0 - (x - 0.7) ** 2}

    picks = []
    for _ in range(24):
        params, trial_id = job.register_trial()
        assert params is not None
        picks.append(params["train.optimizer.default.args.lr"])
        job.parameters.append(params)
        job.results.append(objective(params))
    sobol_err = np.abs(np.asarray(picks[:12]) - 0.7)
    gp_err = np.abs(np.asarray(picks[12:]) - 0.7)
    assert gp_err.mean() < sobol_err.mean() * 0.5, (
        f"GP phase did not refine: sobol {sobol_err.mean():.3f} vs "
        f"gp {gp_err.mean():.3f}"
    )


def test_gp_ei_phase_resume_is_deterministic(tmp_path):
    from kge_tpu.search.ax import AxSearchJob

    def build(name):
        config = _search_config(tmp_path, name)
        config.set("ax_search.num_trials", 10)
        config.set("ax_search.num_sobol_trials", 4)
        config.set("ax_search.parameters", [
            {"name": "lookup_embedder.dim", "type": "choice",
             "values": [8, 16, 32]},
            {"name": "train.optimizer.default.args.lr", "type": "range",
             "bounds": [0.01, 1.0], "log_scale": True},
        ])
        return AxSearchJob(config, _dataset(config))

    def objective(params):
        lr = params["train.optimizer.default.args.lr"]
        return {"mean_reciprocal_rank_filtered": -abs(np.log(lr / 0.1))}

    job = build("gp_a")
    job.init_search()
    history = []
    for _ in range(10):
        params, _tid = job.register_trial()
        history.append(params)
        job.parameters.append(params)
        job.results.append(objective(params))

    # fresh job, restore first 6 trials, resume: arms 6..9 must match
    job2 = build("gp_b")
    job2.init_search()
    job2.parameters = list(history[:6])
    job2.results = [objective(p) for p in history[:6]]
    job2._sobol.fast_forward(min(6, job2._num_sobol()))
    job2._generated = 6
    for i in range(6, 10):
        params, _tid = job2.register_trial()
        assert params == history[i], i
        job2.parameters.append(params)
        job2.results.append(objective(params))


def test_parameter_constraints_native_backend(tmp_path):
    """Every arm proposed by the native Sobol+GP fallback must satisfy
    ax_search.parameter_constraints (reference behavior via Ax,
    kge/job/search_ax.py:32-56): Sobol rejection-resamples, the EI pool
    masks infeasible candidates, and resume replays identically."""
    from kge_tpu.search.ax import AxSearchJob

    def build(name):
        config = _search_config(tmp_path, name)
        config.set("ax_search.num_trials", 16)
        config.set("ax_search.num_sobol_trials", 8)
        config.set("ax_search.parameters", [
            {"name": "a", "type": "range", "bounds": [0.0, 1.0]},
            {"name": "b", "type": "range", "bounds": [0.0, 1.0]},
        ])
        config.set("ax_search.parameter_constraints",
                   ["a + b <= 1.0", "a >= b"])
        return AxSearchJob(config, _dataset(config))

    def objective(params):
        a, b = params["a"], params["b"]
        return {"mean_reciprocal_rank_filtered": 1.0 - (a - 0.6) ** 2 - b ** 2}

    job = build("con_a")
    job.init_search()
    history = []
    for _ in range(16):
        params, _tid = job.register_trial()
        assert params is not None
        assert params["a"] + params["b"] <= 1.0 + 1e-9, params
        assert params["a"] >= params["b"] - 1e-9, params
        history.append(params)
        job.parameters.append(params)
        job.results.append(objective(params))

    # resume after 10 trials: the remaining arms must regenerate exactly
    job2 = build("con_b")
    job2.init_search()
    job2.parameters = list(history[:10])
    job2.results = [objective(p) for p in history[:10]]
    # the constrained resume branch replays the rejection process
    for _ in range(min(10, job2._num_sobol())):
        job2._next_feasible_sobol()
    job2._generated = 10
    for i in range(10, 16):
        params, _tid = job2.register_trial()
        assert params == history[i], i
        job2.parameters.append(params)
        job2.results.append(objective(params))


def test_constraint_parser():
    from kge_tpu.search.ax import AxSearchJob

    parsed = AxSearchJob._parse_constraints(
        ["2*a + b <= 5", "a - b >= 0", "a <= b", "a + 1 <= 2*b - 0.5"]
    )
    assert parsed[0] == ({"a": 2.0, "b": 1.0}, "<=", 5.0)
    assert parsed[1] == ({"a": 1.0, "b": -1.0}, ">=", 0.0)
    assert parsed[2] == ({"a": 1.0, "b": -1.0}, "<=", 0.0)
    assert parsed[3] == ({"a": 1.0, "b": -2.0}, "<=", -1.5)
    # scientific-notation constants must not split at the exponent sign
    # (a naive "-" -> "+-" rewrite turns "1e-3" into phantom params)
    parsed = AxSearchJob._parse_constraints(
        ["a <= 1e-3", "2e-2*a + b >= 0", "a - 1E+2*b <= 2.5e-1"]
    )
    assert parsed[0] == ({"a": 1.0}, "<=", 1e-3)
    assert parsed[1] == ({"a": 2e-2, "b": 1.0}, ">=", 0.0)
    assert parsed[2] == ({"a": 1.0, "b": -100.0}, "<=", 0.25)


def test_sharded_trial_farm_two_hosts_shared_fs(tmp_path):
    """Multi-host trial farm: two shards over one shared folder. Shard 0
    runs even trials, shard 1 odd; after both complete, re-running shard
    0 imports shard 1's results from the delegated trial traces and
    selects the global best."""
    import shutil

    from kge_tpu.search.manual import ManualSearchJob

    def build(shard, folder):
        config = _search_config(tmp_path, folder)
        config.set("search.type", "manual_search")
        config.set("search.num_shards", 2)
        config.set("search.shard_index", shard)
        config.set("manual_search.configurations", [
            {"folder": f"t{i}", "train": {"optimizer": {
                "default": {"args": {"lr": lr}}}}}
            for i, lr in enumerate([0.05, 0.1, 0.2, 0.4])
        ])
        return config

    # both shards share ONE search folder (simulated shared FS)
    shared = "sharded"
    c0 = build(0, shared)
    job0 = Job.create(c0, _dataset(c0))
    job0._run()
    c1 = build(1, shared + "_b")
    # shard 1 must see the same folder tree
    shutil.rmtree(c1.folder)
    c1.folder = c0.folder
    job1 = Job.create(c1, _dataset(c1))
    out1 = job1._run()
    assert out1  # shard 1 found a best among its own trials

    # fresh shard-0 job over the completed tree: delegated results import
    c2 = build(0, shared + "_c")
    shutil.rmtree(c2.folder)
    c2.folder = c0.folder
    job2 = Job.create(c2, _dataset(c2))
    # trials already ran: run_trial resumes from checkpoints instantly
    out2 = job2._run()
    assert out2["best_trial"] is not None
    # all four trial folders exist (each shard created its own)
    for i in range(4):
        assert os.path.isdir(os.path.join(c0.folder, f"t{i}")), i


def test_dump_trace_of_search_folder(tmp_path, capsys):
    """`kge dump trace <search folder>` falls back to the search
    aggregation (reference kge/util/dump.py:370-376): per-trial summary
    entries from the copied-back trial traces appear in one dump."""
    import argparse

    import yaml as _yaml

    from kge_tpu.utils.dump import dump_trace

    config = _search_config(tmp_path, "manual_search")
    config.set("manual_search.configurations", [
        {"folder": "lr01", "train.optimizer.default.args.lr": 0.1},
        {"folder": "lr05", "train.optimizer.default.args.lr": 0.5},
    ])
    job = Job.create(config, _dataset(config))
    job.run()
    args = argparse.Namespace(
        source=config.folder, job_id=None, train=False, valid=False,
        test=False, search=True, yaml=True, keysfile=None, keys=None,
        max_epoch=None, example=False, batch=False, checkpoint=False,
        truncate=False, no_header=False, no_default_keys=False,
        list_keys=False,
    )
    capsys.readouterr()  # drop the search job's own console output
    dump_trace(args)
    out = [_yaml.safe_load(ln)
           for ln in capsys.readouterr().out.strip().splitlines()]
    # per-trial validation summaries (scope train, folder tagged) and
    # the search-completed record all land in one dump
    trial_rows = [e for e in out
                  if e.get("scope") == "train" and e.get("folder")]
    assert len(trial_rows) >= 2, "expected per-trial summary entries"
    folders = {e["folder"] for e in trial_rows}
    assert {"lr01", "lr05"} <= folders, folders
    assert any(e.get("job") == "search" for e in out)
