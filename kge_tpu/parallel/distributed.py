"""Multi-host initialization, hybrid ICI/DCN meshes, and global fetches.

The reference has no distributed communication backend at all (SURVEY.md
section 2.5); this module is the framework's comm layer: ``jax.distributed``
process bootstrap plus meshes whose "model" axis stays inside one
process/slice (collectives ride ICI) while "data" spans processes (DCN).

Wiring: ``TrainingJob.__init__`` and the CLI call
:func:`maybe_init_from_config` (driven by the ``tpu.multihost`` config
section) before any backend use; ``parallel.mesh.build_mesh`` delegates
here whenever ``jax.process_count() > 1``; checkpoint/metric fetches go
through :func:`fetch_global`, which replicates cross-process shards
before pulling them to host.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from kge_tpu.config import Config

_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    TPU pod metadata when available). Idempotent per process."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # TPU pod auto-bootstrap (slice metadata carries the coordinator);
        # on failure this is a plain single-process run
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", 0)
        ),
    )
    _INITIALIZED = True


def maybe_init_from_config(config: Config):
    """Bootstrap jax.distributed per the ``tpu.multihost`` section.

    - ``off``: never initialize.
    - ``on``: initialize from the config keys (falling back to env vars /
      pod metadata for unset ones).
    - ``auto`` (default): initialize only when an explicit signal is
      present — a configured or env coordinator address / process count —
      so plain single-host runs never touch jax.distributed.

    Must run before the first backend touch (jax.distributed.initialize
    rejects late calls); safe to call multiple times.
    """
    mode = str(config.get("tpu.multihost.enabled")).lower()
    if mode in ("off", "false", "0"):
        return
    addr = config.get("tpu.multihost.coordinator_address") or None
    nproc = int(config.get("tpu.multihost.num_processes"))
    pid = int(config.get("tpu.multihost.process_id"))
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_nproc = os.environ.get("JAX_NUM_PROCESSES")
    if mode in ("on", "true", "1"):
        init_distributed(
            addr, nproc if nproc > 0 else None, pid if pid >= 0 else None
        )
    elif addr or nproc > 0 or env_addr or env_nproc:
        init_distributed(
            addr, nproc if nproc > 0 else None, pid if pid >= 0 else None
        )


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    files, trace copy-back). Always True single-process."""
    return jax.process_index() == 0


def build_hybrid_mesh(config: Config, devices=None):
    """(data, model) mesh for multi-process runs: 'model' tiles are
    contained within one process's devices (collectives ride ICI) and
    'data' blocks span processes (gradient all-reduce crosses DCN).

    Devices are ordered process-major, which realizes exactly the
    (processes, local) hybrid layout of
    ``mesh_utils.create_hybrid_device_mesh((data/P, model), (P, 1))``
    while also working on backends without slice metadata (the CPU
    cluster used for multi-host tests)."""
    from jax.sharding import Mesh

    data = config.get("tpu.mesh.data")
    model = config.get("tpu.mesh.model")
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    n_proc = jax.process_count()
    if data == -1:
        data = max(1, n // max(model, 1))
    if data * model == 1:
        return None
    per_process = n // max(n_proc, 1)
    if n_proc > 1:
        if model > per_process:
            raise ValueError(
                f"model axis {model} exceeds per-host device count "
                f"{per_process}; model sharding must stay on ICI"
            )
        if per_process % model != 0:
            raise ValueError(
                f"model axis {model} must divide the per-host device "
                f"count {per_process}"
            )
        if data * model != n:
            raise ValueError(
                f"multi-host meshes must use every device so all "
                f"processes participate: {data}x{model} != {n} devices"
            )
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    dev_array = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def put_global(arr: np.ndarray, sharding):
    """Place a host array that every process holds in full onto a (possibly
    cross-process) sharding. Single-process this is jax.device_put; under
    multi-host each process materializes only its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


import functools


@functools.lru_cache(maxsize=64)
def _replicator(sharding):
    """One cached jitted identity per target sharding: a fresh
    jax.jit(lambda ...) per call would retrace + recompile the gather
    program on every checkpoint/epoch fetch (jit caches key on the
    function object)."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def barrier(name: str):
    """Cross-process sync point (no-op single-process): used after
    primary-only filesystem writes so other processes cannot race the
    write on a shared filesystem."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def fetch_global(tree):
    """jax.device_get that also works for arrays sharded across
    processes: non-addressable shards are first replicated with an
    identity jit (an all-gather over DCN), then pulled. Collective —
    every process must call it at the same point."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = _replicator(NamedSharding(x.sharding.mesh, P()))(x)
        return x

    tree = jax.tree_util.tree_map(one, tree)
    return jax.device_get(tree)
