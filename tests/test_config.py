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
