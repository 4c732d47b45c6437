"""Config engine tests: dotted access, defaults, +++ subtrees, imports."""

import pytest

from kge_tpu import Config


def test_get_and_set():
    config = Config()
    assert config.get("train.type") == "KvsAll"
    config.set("train.type", "1vsAll")
    assert config.get("train.type") == "1vsAll"
    with pytest.raises(KeyError):
        config.get("train.no_such_key")
    with pytest.raises(KeyError):
        config.set("train.no_such_key", 1)
    # type checking with str->number coercion (CLI input)
    config.set("train.batch_size", "17")
    assert config.get("train.batch_size") == 17
    with pytest.raises(ValueError):
        config.set("train.batch_size", "not_a_number")


def test_plusplusplus_subtree():
    config = Config()
    # user subtree is extensible
    config.set("user.my_key", 1.5)
    assert config.get("user.my_key") == 1.5
    # +++ keys are stripped from get() results
    assert "+++" not in config.get("user")


def test_get_default_type_indirection():
    config = Config()
    config._import("complex")
    config.set("model", "complex")
    # complex.entity_embedder has type lookup_embedder but no dim of its own:
    # get_default must resolve through the type pointer
    assert config.get_default("complex.entity_embedder.dim") == 100
    config.set("complex.entity_embedder.dim", 64, create=True)
    assert config.get_default("complex.entity_embedder.dim") == 64


def test_flatten_roundtrip():
    config = Config()
    flat = Config.flatten(config.options)
    assert flat["train.type"] == "KvsAll"
    assert flat["dataset.files.train.filename"] == "train.del"


def test_clone_is_independent():
    config = Config()
    clone = config.clone()
    clone.set("train.max_epochs", 7)
    assert config.get("train.max_epochs") != 7


def test_deprecated_libkge_keys_rewrite():
    """Old-style LibKGE configs load with keys/values migrated (the
    reference's table, kge/config.py:661-869)."""
    from kge_tpu import Config

    config = Config()
    config.load_options({
        "eval": {"filter_with_test": True, "chunk_size": 512,
                 "metrics_per": {"relation_type": True}},
        "negative_sampling": {"num_samples_o": 7,
                              "filter_positives_o": True,
                              "implementation": "sp_po"},
        "train": {"type": "1toN",
                  "optimizer": "Adagrad",
                  "optimizer_args": {"lr": 0.3}},
    })
    assert config.get("entity_ranking.filter_with_test") is True
    assert config.get("entity_ranking.chunk_size") == 512
    assert config.get("entity_ranking.metrics_per.relation_type") is True
    assert config.get("negative_sampling.num_samples.o") == 7
    assert config.get("negative_sampling.filtering.o") is True
    assert config.get("negative_sampling.implementation") == "batch"
    assert config.get("train.type") == "KvsAll"
    assert config.get("train.optimizer.default.type") == "Adagrad"
    assert config.get("train.optimizer.default.args.lr") == 0.3


def test_deprecated_conflicting_keys_raise():
    from kge_tpu import Config
    import pytest as _pytest

    config = Config()
    with _pytest.raises(ValueError):
        config.load_options({
            "eval": {"chunk_size": 512},
            "entity_ranking": {"chunk_size": 1024},
        })


def test_recipe_configs_build_jobs():
    """examples/recipes/*.yaml (the reference's default GNN training
    recipes) must load and construct their training jobs (tiny fixture
    dataset substituted; one batch dims shrunk for speed)."""
    import glob
    import os

    import pytest

    from kge_tpu import Config, Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import get_dataset_folder

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "examples/recipes/*.yaml")))
    assert len(paths) >= 6
    for path in paths:
        config = Config()
        config.folder = None
        config.set("console.quiet", True, create=True)
        config.load(path, create=True)
        config.set("dataset.name", "dataset_test")
        config.set("job.device", "cpu")
        config.set("train.batch_size", 4)
        config.set("train.max_epochs", 1)
        # 4-entity fixture: 1/E exceeds recipe label smoothing; let the
        # job auto-correct instead of rejecting the recipe value
        config.set("train.auto_correct", True)
        model_key = config.get("model")
        for side in ("entity_embedder", "relation_embedder"):
            config.set(f"{model_key}.{side}.dim", 16)
        # rgcn recipe: 100 block-diagonal blocks need dim % blocks == 0
        try:
            if config.get(f"{model_key}.encoder.num_blocks_or_bases") > 16:
                config.set(f"{model_key}.encoder.num_blocks_or_bases", 4)
        except KeyError:
            pass
        try:
            config.set(f"{model_key}.decoder.base_model.entity_embedder.dim",
                       16)
            config.set(
                f"{model_key}.decoder.base_model.relation_embedder.dim", 16)
        except KeyError:
            pass
        if config.get("negative_sampling.graph_sampling") != "None":
            config.set("negative_sampling.graph_sampling_size", 4)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        job = TrainingJob.create(config, dataset)
        assert job is not None, path


def test_example_configs_build_jobs():
    """Every examples/toy-*.yaml must load against the bundled toy
    dataset and construct its job (no training — catches config drift
    between the examples and the schema)."""
    import glob
    import os

    from kge_tpu import Config, Dataset
    from kge_tpu.train.job import Job

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "examples/toy-*.yaml")))
    assert len(paths) >= 10
    for path in paths:
        config = Config()
        config.folder = None
        config.set("console.quiet", True, create=True)
        config.load(path, create=True)
        config.set("job.device", "cpu")
        dataset = Dataset.create(
            config, os.path.join(repo, "data", "toy"), preload_data=False
        )
        job = Job.create(config, dataset)
        assert job is not None, path


def test_set_coerces_cli_bool_strings():
    """Boolean options must accept CLI string forms — late overrides for
    imported-module keys arrive as raw strings."""
    config = Config()
    assert config.set("train.auto_correct", "True") is True
    assert config.set("train.auto_correct", "false") is False
    assert config.set("train.auto_correct", "1") is True
    with pytest.raises(ValueError):
        config.set("train.auto_correct", "not-a-bool")


def test_deprecated_key_in_bare_config_does_not_crash():
    """Config objects without defaults (built during module import) must
    survive deprecated-key rewriting — Config.log reads console.quiet,
    which such configs lack."""
    config = Config(load_default=False)
    config.load_options({"train": {"optimizer": "Adam"}}, create=True)
    assert config.get("train.optimizer.default.type") == "Adam"
