"""Training tests: end-to-end epochs per strategy and the subbatch
(gradient accumulation) invariance (mirrors reference tests/test_train.py)."""

import numpy as np
import pytest

from kge_tpu import Dataset
from kge_tpu.train.train import TrainingJob

from tests.util import create_config, get_dataset_folder

TRAIN_TYPES = ["1vsAll", "KvsAll", "negative_sampling"]


def _make_job(train_type, subbatch_size=-1, model="complex", extra=None):
    config = create_config("dataset_test", model=model)
    config.set("train.type", train_type)
    config.set("train.batch_size", 4)
    config.set("train.subbatch_size", subbatch_size)
    config.set("train.max_epochs", 1)
    config.set("valid.every", 0)
    config.set("lookup_embedder.dim", 16)
    config.set("random_seed.default", 1234)
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    for key, value in (extra or {}).items():
        config.set(key, value, create=True)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    return TrainingJob.create(config, dataset)


@pytest.mark.parametrize("train_type", TRAIN_TYPES)
def test_one_epoch_runs(train_type):
    job = _make_job(train_type)
    trace = job.run()
    assert trace["epoch"] == 1
    assert np.isfinite(trace["avg_loss"])
    assert np.isfinite(trace["avg_cost"])


def test_relation_slot_negatives():
    """Corrupting the RELATION slot (num_samples.p, scored via
    score_so(p_subset=...)) trains end-to-end, including positive
    filtering on all three slots (reference example
    toy-complex-train-sampling.yaml uses exactly this shape)."""
    job = _make_job("negative_sampling", extra={
        "negative_sampling.num_samples.s": 2,
        "negative_sampling.num_samples.p": 2,
        "negative_sampling.num_samples.o": 2,
        "negative_sampling.filtering.s": True,
        "negative_sampling.filtering.p": True,
        "negative_sampling.filtering.o": True,
        "train.loss": "margin_ranking",
        "train.loss_arg": 2.0,
    })
    trace = job.run()
    assert np.isfinite(trace["avg_loss"])


@pytest.mark.parametrize("train_type", TRAIN_TYPES)
def test_subbatch_invariance(train_type):
    """Forward-only loss must be identical with and without subbatching
    (reference: tests/test_train.py:33-53)."""
    losses = []
    for subbatch in (-1, 3):
        config = create_config("dataset_test", model="complex")
        config.set("train.type", train_type)
        config.set("train.batch_size", 6)
        config.set("train.subbatch_size", subbatch)
        config.set("lookup_embedder.dim", 16)
        config.set("random_seed.default", 99)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        job = TrainingJob.create(config, dataset, forward_only=True)
        job._prepare()
        job._is_prepared = True
        job.epoch = 1
        trace = job.run_epoch()
        losses.append(trace["avg_loss"])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_negative_sampling_variants():
    for extra in [
        {"negative_sampling.implementation": "triple"},
        {"negative_sampling.implementation": "all"},
        {"negative_sampling.implementation": "batch"},
        {"negative_sampling.shared": True,
         "negative_sampling.implementation": "batch"},
        {"negative_sampling.sampling_type": "frequency"},
        {"negative_sampling.filtering.o": True,
         "negative_sampling.filtering.s": True},
    ]:
        job = _make_job("negative_sampling", extra=extra)
        trace = job.run()
        assert np.isfinite(trace["avg_loss"]), extra


def test_losses_all_train():
    for loss in ["bce", "kl", "margin_ranking", "soft_margin", "se",
                 "bce_mean", "bce_self_adversarial"]:
        job = _make_job("negative_sampling", extra={"train.loss": loss})
        trace = job.run()
        assert np.isfinite(trace["avg_loss"]), loss


def test_weighted_regularization_and_scheduler():
    job = _make_job(
        "negative_sampling",
        extra={
            "lookup_embedder.regularize_weight": 0.01,
            "lookup_embedder.regularize_args.weighted": True,
            "train.lr_scheduler": "ExponentialLR",
            "train.lr_scheduler_args.gamma": 0.9,
            "train.max_epochs": 2,
        },
    )
    trace = job.run()
    assert np.isfinite(trace["avg_cost"])
    assert trace["avg_penalty"] > 0


def test_kvsall_query_types():
    """All three KvsAll query types incl. relation prediction (s_o)."""
    job = _make_job("KvsAll", extra={
        "KvsAll.query_types.sp_": True,
        "KvsAll.query_types._po": True,
        "KvsAll.query_types.s_o": True,
        "KvsAll.label_smoothing": 0.3,
    })
    trace = job.run()
    assert np.isfinite(trace["avg_loss"])
    # examples = unique sp + po + so keys
    dataset = job.dataset
    expected = sum(
        len(dataset.index(f"train_{k}")) for k in
        ("sp_to_o", "po_to_s", "so_to_p")
    )
    assert job.num_examples == expected


def test_steps_per_dispatch_invariance():
    """Grouped dispatch (lax.scan over k batches) must give the same
    losses as per-batch dispatch (same per-batch RNG fold)."""
    import numpy as np
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config

    def run(group):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 2)
        config.set("negative_sampling.num_samples.s", 3)
        config.set("negative_sampling.num_samples.o", 3)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("random_seed.default", 7)
        config.set("valid.every", 0)
        config.set("tpu.steps_per_dispatch", group)
        dataset = Dataset.create(config)
        job = TrainingJob.create(config, dataset)
        job.run()
        return job

    a = run(1)
    b = run(4)
    np.testing.assert_allclose(
        np.asarray(a.params["entity_embedder"]["weights"]),
        np.asarray(b.params["entity_embedder"]["weights"]),
        atol=1e-6,
    )


def test_steps_per_dispatch_invariance_under_mesh():
    """Grouped dispatch must also run (and match per-batch dispatch)
    under a (data, model) mesh: the stacked batch shards over "data" on
    axis 1 behind the k-stack axis (round-1 verdict weak point #6: the
    grouping silently disabled exactly where dispatch overhead
    matters)."""
    import numpy as np
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config, get_dataset_folder

    def run(group):
        config = create_config("dataset_test", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("train.batch_size", 8)
        config.set("train.max_epochs", 2)
        config.set("negative_sampling.num_samples.s", 3)
        config.set("negative_sampling.num_samples.o", 3)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("random_seed.default", 7)
        config.set("valid.every", 0)
        config.set("tpu.mesh.data", 2)
        config.set("tpu.mesh.model", 2)
        config.set("tpu.steps_per_dispatch", group)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        job = TrainingJob.create(config, dataset)
        assert job.mesh is not None
        assert job._steps_per_dispatch() == group
        job.run()
        return job

    a = run(1)
    b = run(4)
    np.testing.assert_allclose(
        np.asarray(a.params["entity_embedder"]["weights"]),
        np.asarray(b.params["entity_embedder"]["weights"]),
        atol=1e-6,
    )


def test_device_resident_epoch_invariance():
    """With on-device sampling, grouped dispatch goes device-resident
    (the whole epoch's positive indices ship once; each dispatch sends
    a scalar start index — train.py _build_epoch_group_step). The
    trajectory must be bit-compatible with per-batch dispatch: same
    (start+i) RNG folds, same batches, tail shorter than the group
    handled per-batch."""
    import numpy as np
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config

    def run(group):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 2)
        config.set("train.loss", "kl")
        config.set("negative_sampling.shared", True)
        config.set("negative_sampling.implementation", "batch")
        config.set("negative_sampling.num_samples.s", 3)
        config.set("negative_sampling.num_samples.o", 3)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("random_seed.default", 7)
        config.set("valid.every", 0)
        config.set("tpu.fused_negsamp_loss", "always")
        config.set("tpu.on_device_sampling", "always")
        config.set("tpu.steps_per_dispatch", group)
        dataset = Dataset.create(config)
        job = TrainingJob.create(config, dataset)
        job.run()
        assert job._on_device_sampling
        return job

    a = run(1)
    b = run(4)
    # the resident grouped program actually engaged (and a tail shorter
    # than the group exists so the per-batch remainder path ran too)
    assert ("epoch", 4) in b._group_steps
    assert a.num_examples % (32 * 4) != 0
    np.testing.assert_allclose(
        np.asarray(a.params["entity_embedder"]["weights"]),
        np.asarray(b.params["entity_embedder"]["weights"]),
        atol=1e-6,
    )


def test_batch_trace_level_with_grouped_dispatch():
    """train.trace_level: batch must expand grouped metrics back into one
    trace entry per real batch."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from kge_tpu.utils.dump import read_trace
    import math, os, tempfile

    from tests.util import create_config

    with tempfile.TemporaryDirectory() as folder:
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 1)
        config.set("train.trace_level", "batch")
        config.set("negative_sampling.num_samples.s", 3)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("valid.every", 0)
        config.set("tpu.steps_per_dispatch", 4)
        dataset = Dataset.create(config)
        config.folder = folder
        config.init_folder() if hasattr(config, "init_folder") else None
        job = TrainingJob.create(config, dataset)
        job.run()
        entries = read_trace(os.path.join(folder, "trace.yaml"))
        batch_entries = [e for e in entries if e.get("scope") == "batch"]
        expected = math.ceil(len(dataset.split("train")) / 32)
        assert len(batch_entries) == expected
        assert all("avg_loss" in e for e in batch_entries)


def test_sparse_with_autocompleted_num_samples():
    """num_samples.s: -1 copies from o (sampler auto-complete); the
    sparse payload's static unique size must account for it (stable
    shapes, no per-batch recompiles)."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config

    config = create_config("toy", model="complex")
    config.set("console.quiet", True)
    config.set("lookup_embedder.dim", 16)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 32)
    config.set("train.max_epochs", 2)
    config.set("negative_sampling.num_samples.s", -1)
    config.set("negative_sampling.num_samples.o", 5)
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("valid.every", 0)
    config.set("tpu.sparse_updates", "always")
    config.set("random_seed.default", 3)
    dataset = Dataset.create(config)
    job = TrainingJob.create(config, dataset)
    assert job._sparse_paths
    job._prepare()
    job._is_prepared = True
    shapes = {batch["uniq_e"].shape for batch in job._generate_batches(1)}
    assert len(shapes) == 1, shapes
    job.run()


def test_bfloat16_compute_dtype_end_to_end():
    """tpu.compute_dtype: bfloat16 must train end-to-end (params stay
    f32, scoring runs bf16) and track the f32 run's loss trajectory to
    bf16 tolerance."""
    import numpy as np
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config, get_dataset_folder

    losses = {}
    for dtype in ("float32", "bfloat16"):
        config = create_config("dataset_test", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("train.batch_size", 8)
        config.set("train.max_epochs", 3)
        config.set("negative_sampling.num_samples.s", 4)
        config.set("negative_sampling.num_samples.o", 4)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("random_seed.default", 11)
        config.set("valid.every", 3)
        config.set("tpu.compute_dtype", dtype)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        job = TrainingJob.create(config, dataset)
        job.run()
        losses[dtype] = float(job.current_trace["epoch"]["avg_loss"])
        # params must remain float32 regardless of compute dtype
        assert job.params["entity_embedder"]["weights"].dtype == np.float32
        assert "mean_reciprocal_rank_filtered" in job.valid_trace[-1]
    # bf16 has ~3 decimal digits; trajectories should stay close
    assert abs(losses["bfloat16"] - losses["float32"]) \
        / abs(losses["float32"]) < 0.05, losses


def test_steps_per_dispatch_groups_kvsall():
    """KvsAll batches regroup into same-structure runs so grouped
    dispatch engages (query type and label-bucket width must match for
    batches to stack). The batch multiset is unchanged — only order."""
    import numpy as np
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config

    def run(group):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "KvsAll")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 1)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("random_seed.default", 7)
        config.set("valid.every", 0)
        config.set("tpu.steps_per_dispatch", group)
        dataset = Dataset.create(config)
        return TrainingJob.create(config, dataset)

    def epoch_trace(group):
        job = run(group)
        job._prepare()
        job._is_prepared = True
        job.epoch = 1
        return job, job.run_epoch()

    ja, ta = epoch_trace(1)
    jb, tb = epoch_trace(4)
    # grouped steps actually compiled and ran
    assert 4 in jb._group_steps, "no grouped dispatch engaged for KvsAll"
    assert not ja._group_steps
    # same number of batches and examples processed
    assert ta["batches"] == tb["batches"]
    assert ta["size"] == tb["size"]
    assert np.isfinite(tb["avg_loss"])


def test_early_stopping_fires_on_plateau():
    """A constant validation metric is NOT improvement: stop after
    `patience` validations whose best FIRST occurred earlier (reference
    kge/job/train.py best_index semantics)."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config, get_dataset_folder

    def make(entries):
        config = create_config("dataset_test", model="complex")
        config.set("train.type", "1vsAll")
        config.set("train.batch_size", 8)
        config.set("train.max_epochs", 3)
        config.set("valid.every", 0)
        config.set("valid.early_stopping.patience", 2)
        config.set("lookup_embedder.dim", 8)
        config.set("random_seed.default", 3)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        job = TrainingJob.create(config, dataset)
        job.valid_trace = [
            {config.get("valid.metric"): v} for v in entries
        ]
        return job

    # plateau: best first occurred 3 validations ago -> stop before epoch 1
    job = make([0.5, 0.5, 0.5])
    job.run()
    assert job.epoch == 0
    # still improving: best is the latest entry -> run to max_epochs
    job = make([0.1, 0.2, 0.3])
    job.run()
    assert job.epoch == 3


def test_prefetch_producer_exits_when_consumer_abandons():
    """Closing the consumer generator mid-epoch must release the
    producer thread blocked on the full queue (no leaked threads or
    pinned batches per aborted trial)."""
    import threading
    import time as _time

    from kge_tpu.train.train import _prefetch

    before = set(threading.enumerate())
    gen = _prefetch(iter(range(1000)), depth=2)
    assert next(gen) == 0
    new = [t for t in threading.enumerate() if t not in before]
    assert len(new) == 1  # the producer
    gen.close()
    deadline = _time.time() + 5.0
    while new[0].is_alive() and _time.time() < deadline:
        _time.sleep(0.02)
    assert not new[0].is_alive(), "producer thread leaked after close()"


def test_init_distributed_rejects_missing_process_id(monkeypatch):
    """An explicit multi-host config without per-host process ids must
    fail fast (a silent 0 default registers every host as primary)."""
    import pytest as _pytest

    from kge_tpu.parallel import distributed

    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    monkeypatch.setattr(distributed, "_INITIALIZED", False)
    with _pytest.raises(ValueError, match="process id"):
        distributed.init_distributed("127.0.0.1:1234", 2, None)


def test_broadcast_int_single_process_identity():
    from kge_tpu.parallel.distributed import broadcast_int

    assert broadcast_int(12345) == 12345
