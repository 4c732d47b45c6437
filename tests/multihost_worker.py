"""Worker process for the 2-process CPU-cluster multi-host test.

Run as ``python -m tests.multihost_worker <pid> <nproc> <port> <outdir>``.
Each worker carries 2 virtual CPU devices; jax.distributed is initialized
by the FRAMEWORK (TrainingJob -> maybe_init_from_config) from the
``tpu.multihost`` config keys — that wiring is exactly what the test
exercises. The worker trains a tiny model on a hybrid (data=2, model=2)
mesh (data spans processes) and dumps its per-epoch avg_loss so the test
can assert parity with a single-process mesh run.
"""

import json
import os
import sys


def configure_model(config, model_name):
    """Model-specific keys shared by the workers and the single-process
    comparator (tests/test_multihost.py)."""
    if model_name in ("compgcn", "ragat"):
        config.set(f"{model_name}.decoder.model", "distmult")
        config.set(f"{model_name}.decoder.type", "distmult")
        for key in (f"{model_name}.entity_embedder.dim",
                    f"{model_name}.relation_embedder.dim",
                    f"{model_name}.decoder.base_model.entity_embedder.dim",
                    f"{model_name}.decoder.base_model.relation_embedder.dim"):
            config.set(key, 16, create=True)
        if model_name == "ragat":
            # deterministic across process layouts
            config.set("ragat.encoder.emb_entity_dropout", 0.0)
            config.set(
                "ragat.encoder.message_passing_args"
                ".emb_propagation_dropout", 0.0,
            )
    else:
        config.set("lookup_embedder.dim", 16)


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    model_name = sys.argv[5] if len(sys.argv) > 5 else "complex"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from kge_tpu import Dataset
    from kge_tpu.train.train import TrainingJob
    from tests.util import create_config, get_dataset_folder

    config = create_config("dataset_test", model=model_name)
    config.set("train.type", "negative_sampling")
    config.set("random_seed.default", 41)
    config.set("random_seed.numpy", 41)
    config.set("random_seed.jax", 41)
    configure_model(config, model_name)
    config.set("train.batch_size", 16)
    config.set("train.max_epochs", 2)
    config.set("valid.every", 2)
    config.set("eval.batch_size", 16)
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("tpu.mesh.data", 2)
    config.set("tpu.mesh.model", 2)
    config.set("tpu.steps_per_dispatch", 1)
    config.set("tpu.multihost.enabled", "on")
    config.set("tpu.multihost.coordinator_address", f"localhost:{port}")
    config.set("tpu.multihost.num_processes", nproc)
    config.set("tpu.multihost.process_id", pid)
    # ONE shared folder for all processes (the supported multi-host
    # layout): process 0 writes checkpoints/kge.log/trace.yaml there,
    # non-primary logs divert to proc<k>/ subfolders
    config.folder = os.path.join(outdir, "shared_folder")
    os.makedirs(config.folder, exist_ok=True)

    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    job = TrainingJob.create(config, dataset)
    assert jax.process_count() == nproc, jax.process_count()
    assert job.mesh is not None and dict(job.mesh.shape) == {
        "data": 2, "model": 2
    }
    if model_name == "compgcn":
        # the edge-partitioned halo path must engage under the hybrid
        # multi-host mesh, not fall back to GSPMD
        enc = job.model._encoder
        assert any(k.startswith("halo_") for k in enc._graph_np), \
            "multihost mesh GNN did not build halo structures"
    losses = []
    job.post_epoch_hooks.append(
        lambda j: losses.append(float(j.current_trace["epoch"]["avg_loss"]))
    )
    job.run()
    mrr = (job.valid_trace[-1]["mean_reciprocal_rank_filtered"]
           if job.valid_trace else None)

    # resume from the shared checkpoint: both processes load the
    # primary's file and continue in lockstep for one more epoch
    from kge_tpu.train.job import Job
    from kge_tpu.utils.io import load_checkpoint

    checkpoint = load_checkpoint(config.checkpoint_file(2))
    config.set("train.max_epochs", 3)
    job2 = Job.create_from(checkpoint, new_config=config, dataset=dataset)
    assert job2.epoch == 2
    job2.run()
    resumed_epoch = job2.epoch

    with open(os.path.join(outdir, f"loss_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "process_count": jax.process_count(),
                   "valid_mrr": mrr, "resumed_epoch": resumed_epoch}, f)


if __name__ == "__main__":
    main()
