"""Preprocessing tests (mirrors the reference test family,
tests/test_preprocess.py): dense complete id maps, correctly derived
sampled/filtered splits, and dataset.yaml contents."""

import os
import shutil

import numpy as np
import pytest
import yaml

from kge_tpu.utils.preprocess import preprocess_default, preprocess_wn11

from tests.util import get_dataset_folder


@pytest.fixture()
def folder(tmp_path):
    src = get_dataset_folder("dataset_preprocess")
    dst = tmp_path / "raw"
    shutil.copytree(src, dst)
    return str(dst)


def _read_del(folder, name):
    path = os.path.join(folder, name)
    if not os.path.getsize(path):
        return np.zeros((0, 3), dtype=np.int64)
    return np.loadtxt(path, dtype=np.int64, ndmin=2)


def _read_map(folder, name):
    out = {}
    with open(os.path.join(folder, name)) as f:
        for line in f:
            idx, symbol = line.rstrip("\n").split("\t")
            out[symbol] = int(idx)
    return out


def test_default_pipeline(folder):
    config = preprocess_default(folder, seed=1)
    entities = _read_map(folder, "entity_ids.del")
    relations = _read_map(folder, "relation_ids.del")
    # dense, unique, complete
    assert sorted(entities.values()) == list(range(len(entities)))
    assert sorted(relations.values()) == list(range(len(relations)))
    assert set(entities.keys()) == {"a", "b", "c", "d", "e"}
    assert set(relations.keys()) == {"likes", "hates", "new_rel"}
    assert config["num_entities"] == 5
    assert config["num_relations"] == 3

    train = _read_del(folder, "train.del")
    valid = _read_del(folder, "valid.del")
    test = _read_del(folder, "test.del")
    assert train.shape == (5, 3)
    assert valid.shape == (2, 3)
    assert test.shape == (2, 3)
    # round-trip a known triple: a likes b
    assert [entities["a"], relations["likes"], entities["b"]] in train.tolist()

    # train_sample has |valid| rows drawn from train
    sample = _read_del(folder, "train_sample.del")
    assert sample.shape == (2, 3)
    for row in sample.tolist():
        assert row in train.tolist()

    # *_without_unseen drop rows with entities/relations unseen in train
    vwu = _read_del(folder, "valid_without_unseen.del")
    assert vwu.shape == (1, 3)  # "e likes a" dropped (e unseen)
    twu = _read_del(folder, "test_without_unseen.del")
    assert twu.shape == (1, 3)  # "a new_rel b" dropped (new_rel unseen)

    # dataset.yaml is loadable and complete
    with open(os.path.join(folder, "dataset.yaml")) as f:
        meta = yaml.safe_load(f)["dataset"]
    assert meta["files.train.size"] == 5
    assert meta["files.valid_without_unseen.size"] == 1
    assert meta["files.entity_ids.type"] == "map"


def test_loadable_by_dataset(folder):
    from kge_tpu import Config, Dataset

    preprocess_default(folder, seed=1)
    config = Config()
    config.folder = None
    config.set("job.device", "cpu")
    config.set("dataset.pickle", False)
    dataset = Dataset.create(config, folder)
    assert dataset.num_entities() == 5
    assert dataset.split("train").shape == (5, 3)
    assert dataset.entity_ids(0) == "a"


def test_wn11_labeled_pipeline(tmp_path):
    folder = str(tmp_path / "wn11")
    os.makedirs(folder)
    with open(os.path.join(folder, "train.txt"), "w") as f:
        f.write("a\tr1\tb\nb\tr1\tc\nc\tr2\ta\n")
    with open(os.path.join(folder, "valid.txt"), "w") as f:
        f.write("a\tr1\tc\t1\nb\tr2\ta\t-1\n")
    with open(os.path.join(folder, "test.txt"), "w") as f:
        f.write("c\tr1\tb\t1\na\tr2\tb\t-1\nd\tr1\ta\t1\n")
    preprocess_wn11(folder)
    assert _read_del(folder, "valid.del").shape == (1, 3)
    assert _read_del(folder, "valid_negatives.del").shape == (1, 3)
    assert _read_del(folder, "test.del").shape == (2, 3)
    assert _read_del(folder, "test_negatives.del").shape == (1, 3)
    # filtered positives: "d r1 a" dropped (d unseen in train)
    assert _read_del(folder, "test_without_unseen.del").shape == (1, 3)
