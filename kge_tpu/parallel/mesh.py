"""Device selection and mesh construction.

The mesh has two logical axes (configured under ``tpu.mesh``):
- ``data``: batch parallelism (queries/triples sharded)
- ``model``: entity-vocabulary parallelism (embedding tables and the
  entity axis of score matrices sharded)

This is the TPU-native replacement for the reference's single-device
placement + eval chunking (SURVEY.md section 2.5): rank counting reduces
over ``model`` with psum, gradients reduce over ``data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kge_tpu.config import Config


def resolve_device(config: Config) -> jax.Device:
    """Pick the job's device: 'auto' prefers an accelerator, 'cpu' forces
    host execution (useful for tests and tiny datasets)."""
    try:
        cache_dir = config.get("tpu.compilation_cache_dir")
    except KeyError:
        cache_dir = ""
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    name = config.get("job.device")
    if name == "cpu":
        # local_devices: under multi-host, jax.devices() leads with
        # process 0's devices, which other processes cannot place on
        return jax.local_devices(backend="cpu")[0]
    if name in ("auto", ""):
        return jax.local_devices()[0]
    if ":" in name:
        platform, idx = name.split(":")
        return jax.devices(platform)[int(idx)]
    return jax.devices(name)[0]


def build_mesh(config: Config, devices=None) -> Optional[Mesh]:
    """Build the (data, model) mesh, or None for single-device jobs.
    Multi-process runs delegate to the hybrid ICI/DCN construction."""
    if jax.process_count() > 1:
        from kge_tpu.parallel.distributed import build_hybrid_mesh

        return build_hybrid_mesh(config, devices)
    data = config.get("tpu.mesh.data")
    model = config.get("tpu.mesh.model")
    if devices is None:
        if config.get("job.device") == "cpu":
            devices = jax.devices("cpu")
        else:
            devices = jax.devices()
    n = len(devices)
    if data == -1:
        data = max(1, n // max(model, 1))
    if data * model == 1:
        return None
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}"
        )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def params_sharding(mesh: Mesh, params):
    """Vocabulary-shard every [V, d] embedding table over 'model';
    replicate everything else."""
    import jax.tree_util as jtu

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "weights" in keys and leaf.ndim == 2:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jtu.tree_map_with_path(spec_for, params)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
