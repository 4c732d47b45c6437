"""Row-sparse embedding updates (tpu.sparse_updates) must be numerically
equivalent to the dense optimizer path and guard their applicability.

Reference counterpart: torch sparse Adagrad behind ``lookup_embedder.sparse``
(reference: kge/model/embedder/lookup_embedder.yaml:74-77); the sparse and
dense paths optimize the same math, so final tables must match.
"""

import numpy as np
import pytest

from tests.util import create_config, get_dataset_folder
pytestmark = pytest.mark.slow  # 8-device / long-training tests; fast profile: -m 'not slow'


def _run_training(sparse_mode, *, optimizer="Adagrad", shared=False,
                  implementation="triple", model="complex", epochs=3,
                  weighted_reg=True, seed=11, row_kernel="never"):
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    config = create_config("toy", model=model)
    config.set("console.quiet", True)
    config.set("lookup_embedder.dim", 16)
    if weighted_reg:
        config.set("lookup_embedder.regularize", "lp")
        config.set("lookup_embedder.regularize_weight", 0.01)
        config.set("lookup_embedder.regularize_args.weighted", True)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 32)
    config.set("train.max_epochs", epochs)
    config.set("negative_sampling.num_samples.s", 5)
    config.set("negative_sampling.num_samples.o", 7)
    config.set("negative_sampling.shared", shared)
    config.set("negative_sampling.implementation", implementation)
    config.set("train.optimizer.default.type", optimizer)
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("random_seed.default", seed)
    config.set("valid.every", 0)
    config.set("tpu.sparse_updates", sparse_mode)
    config.set("tpu.sparse_row_kernel", row_kernel)
    dataset = Dataset.create(config)
    job = TrainingJob.create(config, dataset)
    job.run()
    return job


def _tables(job):
    params = job.dechunk_params(job.params)  # chunked tables -> [V, D]
    return (
        np.asarray(params["entity_embedder"]["weights"]),
        np.asarray(params["relation_embedder"]["weights"]),
    )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(optimizer="Adagrad", shared=False, implementation="triple"),
        dict(optimizer="Adagrad", shared=True, implementation="batch"),
        dict(optimizer="SGD", shared=False, implementation="batch",
             weighted_reg=False),
    ],
    ids=["adagrad-triple", "adagrad-shared-batch", "sgd-batch"],
)
def test_sparse_matches_dense(kwargs):
    dense = _run_training("off", **kwargs)
    sparse = _run_training("on", **kwargs)
    assert sparse._sparse_paths == (
        "entity_embedder.weights", "relation_embedder.weights"
    )
    for d, s in zip(_tables(dense), _tables(sparse)):
        np.testing.assert_allclose(d, s, atol=5e-6)


@pytest.mark.parametrize("optimizer", ["Adagrad", "SGD"])
def test_row_kernel_matches_xla_scatter(optimizer):
    """The in-place Pallas row-update kernel (tpu.sparse_row_kernel,
    ops/pallas/row_update.py) must reproduce the XLA sorted-scatter
    trajectory exactly — same math, aliased buffers instead of
    whole-table operand copies. Interpret mode on CPU."""
    kwargs = dict(optimizer=optimizer,
                  weighted_reg=(optimizer == "Adagrad"))
    xla = _run_training("on", row_kernel="never", **kwargs)
    ker = _run_training("on", row_kernel="always", **kwargs)
    assert ker._use_row_kernel(0)  # 'always' ignores the size gate
    for a, b in zip(_tables(xla), _tables(ker)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_auto_disables_on_small_vocab():
    job = _run_training("auto", epochs=1)
    assert job._sparse_paths == ()


def test_on_rejects_unsupported_optimizer():
    with pytest.raises(ValueError, match="dense per-row state"):
        _run_training("on", optimizer="Adam", epochs=1)


def test_on_rejects_unweighted_regularization():
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    config = create_config("toy", model="complex")
    config.set("console.quiet", True)
    config.set("lookup_embedder.dim", 16)
    config.set("lookup_embedder.regularize", "lp")
    config.set("lookup_embedder.regularize_weight", 0.01)
    config.set("lookup_embedder.regularize_args.weighted", False)
    config.set("train.type", "negative_sampling")
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("tpu.sparse_updates", "on")
    dataset = Dataset.create(config)
    with pytest.raises(ValueError, match="unweighted regularization"):
        TrainingJob.create(config, dataset)


def test_sparse_under_mesh_matches_dense_single_device():
    """Row-sparse updates on vocab-sharded tables (the Wikidata5M-scale
    configuration: each table shard stays under the 1 GiB scatter limit)
    must reproduce the dense single-device trajectory."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    tables = []
    for sparse, mesh in [("off", (1, 1)), ("on", (4, 2))]:
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("negative_sampling.num_samples.s", 3)
        config.set("negative_sampling.num_samples.o", 3)
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 2)
        config.set("valid.every", 0)
        config.set("random_seed.default", 21)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("tpu.mesh.data", mesh[0])
        config.set("tpu.mesh.model", mesh[1])
        config.set("tpu.sparse_updates", sparse)
        dataset = Dataset.create(config)
        job = TrainingJob.create(config, dataset)
        job.run()
        tables.append(np.asarray(
            job.params["entity_embedder"]["weights"]
        )[: dataset.num_entities()])
    np.testing.assert_allclose(tables[0], tables[1], atol=1e-5)


def test_split_phase_sparse_matches_dense():
    """With tpu.sparse_split_phases=always, sparse updates run as
    PIPELINED split phases (loss program over gathered rows + donated
    update+gather program; the last batch's update flushes at epoch
    end). The trajectory must be identical to the dense path and to the
    fused single-program sparse path — same math, different program
    boundaries. Multi-epoch so the flush/re-gather seam at epoch
    boundaries is exercised. (Split mode is opt-in: the donated update
    program intermittently crashes the v5e worker on the current
    remote-attached backend, so the fused program is the default.)"""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    def run(sparse, split="auto", pipeline="never"):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("negative_sampling.num_samples.s", 5)
        config.set("negative_sampling.num_samples.o", 7)
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 3)
        config.set("valid.every", 0)
        config.set("random_seed.default", 11)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("tpu.sparse_updates", sparse)
        config.set("tpu.sparse_split_phases", split)
        config.set("tpu.sparse_pipelined_gather", pipeline)
        dataset = Dataset.create(config)
        job = TrainingJob.create(config, dataset)
        job.run()
        return job

    dense = run("never")
    fused = run("always")
    split = run("always", split="always")
    pipe = run("always", pipeline="always")
    assert not fused._sparse_split and not fused._sparse_pipeline
    assert split._sparse_split
    assert pipe._sparse_pipeline and not pipe._sparse_split
    assert split._sparse_paths == (
        "entity_embedder.weights", "relation_embedder.weights"
    )
    assert split._steps_per_dispatch() == 1
    for ref_job in (dense, fused):
        for variant in (split, pipe):
            for r, s in zip(_tables(ref_job), _tables(variant)):
                np.testing.assert_allclose(r, s, atol=5e-6)


def test_vocab_sharding_escapes_scatter_limit():
    """Sparse applicability never depends on the scatter limit: over the
    cap (unsharded) sparse updates stay on in the plain fused form (the
    in-place alternatives are gated off by the current platform fault —
    see tpu.sparse_pipelined_gather); forcing the pipelined-gather form
    must give the identical trajectory; under a vocab-sharding mesh the
    per-shard tables are small and the fused form is kept. Every variant
    matches the dense single-device trajectory (exercised at a
    scaled-down cap)."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    def run(mesh, sparse="auto", limit=30000, pipeline="auto"):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("negative_sampling.num_samples.s", 1)
        config.set("negative_sampling.num_samples.o", 1)
        config.set("negative_sampling.shared", True)
        config.set("negative_sampling.implementation", "batch")
        # divisible by the data axis: mesh runs round batch_size up,
        # which would change the trajectory vs the single-device run
        config.set("train.batch_size", 8)
        config.set("train.max_epochs", 1)
        config.set("valid.every", 0)
        config.set("random_seed.default", 5)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("tpu.mesh.data", mesh[0])
        config.set("tpu.mesh.model", mesh[1])
        config.set("tpu.sparse_updates", sparse)
        config.set("tpu.sparse_scatter_limit_bytes", limit)
        config.set("tpu.sparse_pipelined_gather", pipeline)
        # synthetic 900-entity graph: big enough for the 32x
        # vocab/touched-rows crossover check to pass
        n, ks = 900, (1, 2, 5)
        triples = np.array(
            [(a, i, (a + k) % n) for i, k in enumerate(ks)
             for a in range(n)], dtype=np.int32)
        config.set("dataset.num_entities", n)
        config.set("dataset.num_relations", len(ks))
        config.set("dataset.pickle", False)
        dataset = Dataset(config, folder=None)
        dataset._triples.update(
            train=triples, valid=triples[:8], test=triples[8:16])
        job = TrainingJob.create(config, dataset)
        job.run()
        return job

    # unsharded: padded 900-entity table (16 dims, f32) > 30000 bytes
    # -> sparse stays on, plain fused form with the table auto-CHUNKED
    # into sub-limit row chunks (tpu.sparse_table_chunks auto)
    job = run((1, 1))
    assert job._sparse_paths == (
        "entity_embedder.weights", "relation_embedder.weights"
    )
    assert not job._sparse_split and not job._sparse_pipeline
    e_bytes = job.model.get_s_embedder().padded_vocab_size * 16 * 4
    assert e_bytes > 30000
    assert job._table_chunks["entity_embedder.weights"] == -(-e_bytes // 30000)
    assert isinstance(job.params["entity_embedder"]["weights"], tuple)
    # chunked sub-limit buffers scan safely -> grouped dispatch allowed
    assert not job._sparse_host_loop_only()
    # forced pipelined-gather form: REALLY runs here (incl. the
    # epoch-end dummy-batch flush) and must match bit-for-math
    piped = run((1, 1), pipeline="always")
    assert piped._sparse_pipeline
    assert piped._steps_per_dispatch() == 1
    # model=2 mesh: per-shard tables are small -> plain fused form
    sharded = run((4, 2))
    assert sharded._sparse_paths == (
        "entity_embedder.weights", "relation_embedder.weights"
    )
    assert not sharded._sparse_split
    assert not sharded._sparse_pipeline
    dense = run((1, 1), sparse="never", limit=1 << 30)
    for other in (job, piped, sharded):
        other_params = other.dechunk_params(other.params)
        np.testing.assert_allclose(
            np.asarray(other_params["entity_embedder"]["weights"])[:900],
            np.asarray(dense.params["entity_embedder"]["weights"])[:900],
            atol=1e-5,
        )


def test_chunked_tables_match_dense():
    """Row-chunked sparse tables (tpu.sparse_table_chunks, the
    Wikidata5M-scale representation that keeps every scatter buffer
    under tpu.sparse_scatter_limit_bytes) must reproduce the dense AND
    the monolithic-sparse trajectories exactly. Forced chunk counts
    exercise uneven tail chunks (toy vocab not divisible by K) and both
    optimizers; validation runs in the loop so the eval-side dechunk
    view is exercised too."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob

    def run(sparse, chunks="never", optimizer="Adagrad", valid_every=0,
            rowset="auto"):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("negative_sampling.num_samples.s", 5)
        config.set("negative_sampling.num_samples.o", 7)
        config.set("negative_sampling.shared", True)
        config.set("negative_sampling.implementation", "batch")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", 3)
        config.set("valid.every", valid_every)
        config.set("random_seed.default", 11)
        config.set("train.optimizer.default.type", optimizer)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("tpu.sparse_updates", sparse)
        config.set("tpu.sparse_table_chunks", str(chunks))
        config.set("tpu.sparse_group_rowset", rowset)
        dataset = Dataset.create(config)
        job = TrainingJob.create(config, dataset)
        job.run()
        return job

    for optimizer in ("Adagrad", "SGD"):
        dense = run("never", optimizer=optimizer)
        mono = run("always", optimizer=optimizer)
        chunked = run("always", chunks=3, optimizer=optimizer,
                      valid_every=1)
        # the gated row-working-set group step (tpu.sparse_group_rowset
        # always; auto == never on the current TPU runtime) must land on
        # the same trajectory
        rowset = run("always", chunks=3, optimizer=optimizer,
                     rowset="always")
        assert rowset._use_group_rowset()
        for d, c in zip(_tables(dense), _tables(rowset)):
            np.testing.assert_allclose(d, c, atol=5e-6)
        assert chunked._table_chunks == {
            "entity_embedder.weights": 3, "relation_embedder.weights": 3
        }
        assert isinstance(chunked.params["entity_embedder"]["weights"],
                          tuple)
        assert len(chunked.params["entity_embedder"]["weights"]) == 3
        if optimizer == "Adagrad":
            s = chunked.opt_state["sparse"]["entity_embedder.weights"]["sum"]
            assert isinstance(s, tuple) and len(s) == 3
        for d, c in zip(_tables(dense), _tables(chunked)):
            np.testing.assert_allclose(d, c, atol=5e-6)
        for m, c in zip(_tables(mono), _tables(chunked)):
            np.testing.assert_allclose(m, c, atol=5e-6)
        # in-loop validation saw the dechunked view (ran without error)
        assert chunked.valid_trace


def test_chunked_tables_checkpoint_resume(tmp_path):
    """Checkpoints of chunked jobs store whole tables (format identical
    to un-chunked runs) and resume re-chunks: a kill/resume at epoch 2
    must land exactly where the uninterrupted run lands."""
    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from kge_tpu.utils.io import load_checkpoint
    from kge_tpu.train.job import Job

    def make_config(folder, epochs):
        config = create_config("toy", model="complex")
        config.set("console.quiet", True)
        config.set("lookup_embedder.dim", 16)
        config.set("train.type", "negative_sampling")
        config.set("negative_sampling.num_samples.s", 5)
        config.set("negative_sampling.num_samples.o", 7)
        config.set("negative_sampling.shared", True)
        config.set("negative_sampling.implementation", "batch")
        config.set("train.batch_size", 32)
        config.set("train.max_epochs", epochs)
        config.set("valid.every", 0)
        config.set("random_seed.default", 11)
        config.set("train.optimizer.default.args.lr", 0.1, create=True)
        config.set("tpu.sparse_updates", "always")
        config.set("tpu.sparse_table_chunks", "3")
        config.folder = str(folder)
        import os
        os.makedirs(str(folder), exist_ok=True)
        return config

    config = make_config(tmp_path / "full", 4)
    dataset = Dataset.create(config)
    full = TrainingJob.create(config, dataset)
    full.run()

    config2 = make_config(tmp_path / "part", 2)
    dataset2 = Dataset.create(config2)
    part = TrainingJob.create(config2, dataset2)
    part.run()
    # the on-disk table is whole (not chunked)
    ckpt = load_checkpoint(config2.checkpoint_file(2))
    w = ckpt["model"]["params"]["entity_embedder"]["weights"]
    assert not isinstance(w, (tuple, list))
    assert w.ndim == 2

    config3 = make_config(tmp_path / "part", 4)
    resumed = Job.create_from(ckpt, new_config=config3)
    resumed.run()
    assert resumed._table_chunks["entity_embedder.weights"] == 3
    for f, r in zip(_tables(full), _tables(resumed)):
        np.testing.assert_allclose(f, r, atol=5e-6)
