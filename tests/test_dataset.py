"""Dataset + indexing tests: loading, caching round-trip, CSR indexes."""

import glob
import os

import numpy as np
import pytest

from kge_tpu import Config, Dataset
from kge_tpu.indexing import KvsAllIndex

from tests.util import get_dataset_folder


@pytest.fixture()
def config():
    config = Config()
    config.folder = None
    config.set("job.device", "cpu")
    config.set("dataset.name", "dataset_test")
    return config


@pytest.fixture()
def folder():
    return get_dataset_folder("dataset_test")


def _clear_caches(folder):
    for f in glob.glob(os.path.join(folder, "*.cache.pkl")):
        os.remove(f)


def test_load(config, folder):
    _clear_caches(folder)
    config.set("dataset.pickle", False)
    dataset = Dataset.create(config, folder)
    assert dataset.num_entities() == 4
    assert dataset.num_relations() == 3
    assert dataset.split("train").shape == (6, 3)
    assert dataset.split("valid").shape == (2, 3)
    assert dataset.split("test").shape == (2, 3)
    assert dataset.split("train").dtype == np.int32
    assert dataset.entity_ids(0) == "Anna"
    assert dataset.relation_ids(2) == "hates"


def test_cache_roundtrip(config, folder):
    _clear_caches(folder)
    config.set("dataset.pickle", True)
    d1 = Dataset.create(config, folder)
    train1 = d1.split("train").copy()
    idx1 = d1.index("train_sp_to_o")
    # cache files exist now
    assert glob.glob(os.path.join(folder, "*.cache.pkl"))
    # reload from cache: identical content
    d2 = Dataset.create(config.clone(), folder)
    np.testing.assert_array_equal(train1, d2.split("train"))
    idx2 = d2.index("train_sp_to_o")
    np.testing.assert_array_equal(idx1.keys, idx2.keys)
    np.testing.assert_array_equal(idx1.offsets, idx2.offsets)
    np.testing.assert_array_equal(idx1.values, idx2.values)
    _clear_caches(folder)


def test_kvsall_index_semantics():
    triples = np.array(
        [[0, 0, 1], [0, 0, 2], [1, 0, 2], [0, 1, 1], [2, 2, 0]], dtype=np.int32
    )
    index = KvsAllIndex(triples, [0, 1], 2)
    np.testing.assert_array_equal(index.get((0, 0)), [1, 2])
    np.testing.assert_array_equal(index.get((0, 1)), [1])
    np.testing.assert_array_equal(index.get((1, 0)), [2])
    assert len(index.get((5, 5))) == 0
    assert len(index) == 4
    rows, values = index.get_all_coords(np.array([[0, 0], [9, 9], [2, 2]]))
    np.testing.assert_array_equal(rows, [0, 0, 2])
    np.testing.assert_array_equal(values, [1, 2, 0])


def test_default_indexes(config, folder):
    config.set("dataset.pickle", False)
    dataset = Dataset.create(config, folder)
    sp = dataset.index("train_sp_to_o")
    po = dataset.index("train_po_to_s")
    so = dataset.index("train_so_to_p")
    train = dataset.split("train")
    # every triple must be found in each index
    for s, p, o in train:
        assert o in sp.get((s, p))
        assert s in po.get((p, o))
        assert p in so.get((s, o))
    types = dataset.index("relation_types")
    assert len(types) == 3
    assert all(t in ("1-1", "1-N", "M-1", "M-N") for t in types)
    edge_index = dataset.index("edge_index")
    edge_type = dataset.index("edge_type")
    assert edge_index.shape == (2, 2 * len(train))
    assert edge_type.shape == (2 * len(train),)
    # inverse edges use offset relation ids
    assert edge_type[len(train)] == train[0, 1] + dataset.num_relations()
    freq = dataset.index("frequency_percentiles")
    assert set(freq.keys()) == {"subject", "relation", "object"}


def test_native_triple_loader_matches_loadtxt(tmp_path):
    """The C++ parser must agree with np.loadtxt on well-formed .del
    files (extra columns ignored, blank lines skipped) and be fast."""
    import time

    import numpy as np

    from kge_tpu.native import load_triples_native

    rng = np.random.default_rng(0)
    n = 200_000
    t = rng.integers(0, 5_000_000, size=(n, 3))
    path = str(tmp_path / "train.del")
    with open(path, "w") as f:
        for i, (s, p, o) in enumerate(t):
            extra = "\textra_field" if i % 7 == 0 else ""
            f.write(f"{s}\t{p}\t{o}{extra}\n")
            if i % 1000 == 0:
                f.write("\n")  # blank lines are skipped
    t0 = time.perf_counter()
    native = load_triples_native(path)
    dt_native = time.perf_counter() - t0
    ref = np.loadtxt(path, dtype=np.int64, usecols=(0, 1, 2), ndmin=2)
    np.testing.assert_array_equal(native, ref.astype(np.int32))
    assert dt_native < 1.0, f"native parse too slow: {dt_native:.2f}s"


def test_native_triple_loader_rejects_malformed(tmp_path):
    import pytest as _pytest

    from kge_tpu.native import load_triples_native

    path = str(tmp_path / "bad.del")
    with open(path, "w") as f:
        f.write("1\t2\t3\n1\tnot_an_int\t3\n")
    with _pytest.raises(RuntimeError):
        load_triples_native(path)


def test_id_inversion_maps_external_ids():
    """entity/relation_id_to_index must key on EXTERNAL id strings (it
    previously built an identity int->int map by enumerating the dict
    form of the id map)."""
    from tests.util import create_config, get_dataset_folder
    from kge_tpu import Dataset

    config = create_config("dataset_test")
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    inv = dataset.index("entity_id_to_index")
    ids = dataset.entity_ids()
    assert len(inv) == dataset.num_entities()
    for dense, ext in enumerate(ids):
        assert inv[ext] == dense
    assert not any(isinstance(k, int) for k in inv)


def test_kvsall_index_over_empty_split():
    """Lookups against an index built from an EMPTY split must return
    zero counts, not crash (hit via eval filter splits that are empty)."""
    import numpy as np
    from kge_tpu.indexing import KvsAllIndex

    idx = KvsAllIndex(np.zeros((0, 3), dtype=np.int32), [0, 1], 2)
    rows, values = idx.get_all_coords(np.asarray([[1, 2], [0, 0]]))
    assert len(rows) == 0 and len(values) == 0
    counts = idx.counts_for(np.asarray([[1, 2]]))
    assert counts.tolist() == [0]
