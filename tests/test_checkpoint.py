"""Checkpoint rotation, resume, and pretrained-init tests."""

import os

import numpy as np
import pytest

from kge_tpu import Config, Dataset
from kge_tpu.train.job import Job
from kge_tpu.train.train import TrainingJob
from kge_tpu.utils.io import load_checkpoint

from tests.util import create_config, get_dataset_folder


def _job(tmp_path, name="run", **overrides):
    config = create_config("dataset_test", model="complex")
    config.set("train.type", "1vsAll")
    config.set("train.batch_size", 4)
    config.set("train.max_epochs", 7)
    config.set("train.checkpoint.every", 2)
    config.set("train.checkpoint.keep", 2)
    config.set("valid.every", 0)
    config.set("lookup_embedder.dim", 8)
    config.set("random_seed.default", 5)
    for k, v in overrides.items():
        config.set(k, v, create=True)
    config.folder = str(tmp_path / name)
    os.makedirs(config.folder)
    config.init_folder()
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    return TrainingJob.create(config, dataset), config, dataset


def test_checkpoint_rotation(tmp_path):
    job, config, _ = _job(tmp_path)
    job.run()
    files = sorted(f for f in os.listdir(config.folder)
                   if f.startswith("checkpoint"))
    # keep: init (00000), every-2 recent 2 (00004, 00006), last (00007)
    assert "checkpoint_00000.pt" in files
    assert "checkpoint_00007.pt" in files
    assert "checkpoint_00006.pt" in files
    assert "checkpoint_00004.pt" in files
    assert "checkpoint_00002.pt" not in files
    assert "checkpoint_00005.pt" not in files


def test_resume_reproduces_state(tmp_path):
    job, config, dataset = _job(tmp_path, name="a")
    job.run()
    checkpoint = load_checkpoint(config.checkpoint_file(7))
    job2 = Job.create_from(checkpoint, dataset=dataset)
    assert job2.epoch == 7
    np.testing.assert_array_equal(
        np.asarray(job.params["entity_embedder"]["weights"]),
        np.asarray(job2.params["entity_embedder"]["weights"]),
    )


def test_package_is_standalone(tmp_path):
    """A packaged model embeds entity/relation id maps and loads with
    the dataset folder DELETED (reference: kge/util/package.py:38)."""
    import shutil

    import jax.numpy as jnp

    from kge_tpu.models import KgeModel
    from kge_tpu.utils.package import package_model

    ds_copy = str(tmp_path / "ds")
    shutil.copytree(get_dataset_folder("dataset_test"), ds_copy)
    config = create_config("dataset_test", model="complex")
    config.set("train.type", "1vsAll")
    config.set("train.batch_size", 4)
    config.set("train.max_epochs", 1)
    config.set("valid.every", 0)
    config.set("lookup_embedder.dim", 8)
    config.set("random_seed.default", 5)
    config.folder = str(tmp_path / "run")
    os.makedirs(config.folder)
    config.init_folder()
    dataset = Dataset.create(config, ds_copy)
    expected_ids = list(dataset.entity_ids())
    job = TrainingJob.create(config, dataset)
    job.run()
    packaged = package_model(
        config.checkpoint_file(1), os.path.join(config.folder, "model.pt")
    )
    shutil.rmtree(ds_copy)

    checkpoint = load_checkpoint(packaged)
    model, params, state = KgeModel.create_from(checkpoint)
    assert model.dataset.num_entities() == len(expected_ids)
    assert list(model.dataset.entity_ids()) == expected_ids
    assert model.dataset.entity_strings([0, 1]) is not None
    assert model.dataset.relation_strings([0]) is not None
    scores = model.score_sp(params, jnp.asarray([0]), jnp.asarray([0]))
    assert np.asarray(scores).shape == (1, model.dataset.num_entities())


def test_pretrained_initialization(tmp_path):
    # train + package a model, then initialize a new one from it
    job, config, dataset = _job(tmp_path, name="base")
    job.run()
    from kge_tpu.utils.package import package_model

    packaged = package_model(
        config.checkpoint_file("7"),
        os.path.join(config.folder, "model.pt"),
    )
    job2, config2, _ = _job(
        tmp_path, name="pre",
        **{"lookup_embedder.pretrain.model_filename": packaged},
    )
    np.testing.assert_allclose(
        np.asarray(job.params["entity_embedder"]["weights"]),
        np.asarray(job2.params["entity_embedder"]["weights"]),
        rtol=1e-6,
    )


def test_unpackaged_checkpoint_missing_dataset_raises(tmp_path):
    """A NON-packaged checkpoint (no embedded id maps) whose dataset
    folder is gone must surface the original FileNotFoundError, not
    quietly build a map-less Dataset that fails confusingly later."""
    import shutil

    ds_copy = str(tmp_path / "ds")
    shutil.copytree(get_dataset_folder("dataset_test"), ds_copy)
    config = create_config("dataset_test", model="complex")
    config.set("train.type", "1vsAll")
    config.set("train.batch_size", 4)
    config.set("train.max_epochs", 1)
    config.set("valid.every", 0)
    config.set("lookup_embedder.dim", 8)
    config.folder = str(tmp_path / "run")
    os.makedirs(config.folder)
    config.init_folder()
    dataset = Dataset.create(config, ds_copy)
    job = TrainingJob.create(config, dataset)
    job.run()
    checkpoint = load_checkpoint(config.checkpoint_file(1))
    shutil.rmtree(ds_copy)
    with pytest.raises(FileNotFoundError):
        Dataset.create_from(checkpoint)


def test_get_checkpoint_file_default_semantics(tmp_path):
    """'default' with nothing on disk: None for train/search jobs (job is
    recreated from config — how search-folder resume works) but an error
    for eval jobs, which must never score random init (reference
    kge/util/io.py:7-33 raises via load on the eval branch)."""
    from kge_tpu.utils.io import get_checkpoint_file

    config = create_config("dataset_test", model="complex")
    config.folder = str(tmp_path / "empty")
    os.makedirs(config.folder)

    config.set("job.type", "train")
    assert get_checkpoint_file(config) is None
    config.set("job.type", "search", create=True)
    assert get_checkpoint_file(config) is None
    config.set("job.type", "eval")
    with pytest.raises(FileNotFoundError):
        get_checkpoint_file(config)
    # an explicit argument always resolves to the named file
    assert get_checkpoint_file(config, "best").endswith("checkpoint_best.pt")


def test_resume_trajectory_bit_equal_with_graph_sampling(tmp_path):
    """A kill/resume at an epoch boundary reproduces the uninterrupted
    run's per-epoch losses BIT-EQUAL, with per-epoch graph sampling on:
    batch order, sampled subgraphs and negatives are all derived from
    (seed, epoch) rather than a stateful host RNG stream, so epoch k
    draws identically in both runs (reference counterpart: per-epoch
    index re-derivation, kge/job/train_negative_sampling.py:53-64)."""
    import jax.numpy as jnp

    from kge_tpu import Dataset
    from kge_tpu.utils.io import load_checkpoint

    def make(name, max_epochs):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("train.type", "negative_sampling")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", max_epochs)
        config.set("train.checkpoint.every", 1)
        config.set("train.checkpoint.keep", 9)
        config.set("negative_sampling.num_samples.s", 3)
        config.set("negative_sampling.num_samples.o", 3)
        config.set("negative_sampling.graph_sampling", "uniform")
        config.set("negative_sampling.graph_sampling_size", 200)
        config.set("lookup_embedder.dim", 8)
        config.set("random_seed.default", 23)
        config.set("valid.every", 0)
        config.folder = str(tmp_path / name)
        os.makedirs(config.folder)
        config.init_folder()
        dataset = Dataset.create(config)
        return TrainingJob.create(config, dataset), config, dataset

    losses = {}

    def track(tag):
        def hook(j):
            losses.setdefault(tag, []).append(
                float(j.current_trace["epoch"]["avg_loss"])
            )
        return hook

    # uninterrupted: 6 epochs
    job, _, _ = make("full", 6)
    job.post_epoch_hooks.append(track("full"))
    job.run()

    # interrupted: 3 epochs, then resume to 6 from the checkpoint
    job_a, config_a, dataset = make("killed", 3)
    job_a.post_epoch_hooks.append(track("resumed"))
    job_a.run()
    checkpoint = load_checkpoint(config_a.checkpoint_file(3))
    checkpoint["config"].set("train.max_epochs", 6)
    job_b = Job.create_from(checkpoint, dataset=dataset)
    job_b.post_epoch_hooks.append(track("resumed"))
    job_b.run()

    assert len(losses["full"]) == 6 and len(losses["resumed"]) == 6
    np.testing.assert_array_equal(
        np.asarray(losses["full"]), np.asarray(losses["resumed"]),
        err_msg="resumed trajectory diverges from the uninterrupted run",
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(job.params["entity_embedder"]["weights"])),
        np.asarray(jnp.asarray(job_b.params["entity_embedder"]["weights"])),
    )
