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
                     process_id: Optional[int] = None,
                     strict: bool = False):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    TPU pod metadata when available). Idempotent per process.

    ``strict`` (set when ``tpu.multihost.enabled: on`` was explicit):
    a failed bootstrap raises instead of silently degrading to N
    independent single-process runs that would all think they are
    primary and race on the shared folder."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # TPU pod auto-bootstrap (slice metadata carries the coordinator);
        # on failure this is a plain single-process run unless multihost
        # was explicitly requested
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
        except Exception as e:
            if strict:
                raise RuntimeError(
                    "tpu.multihost.enabled is on but jax.distributed "
                    "auto-bootstrap failed (no coordinator_address/"
                    f"num_processes configured either): {e!r}"
                ) from e
        return
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", 1)
    )
    if process_id is None:
        if "JAX_PROCESS_ID" in os.environ:
            process_id = int(os.environ["JAX_PROCESS_ID"])
        elif num_processes > 1:
            # a silent 0 default would register EVERY host as process 0
            # (duplicate ids hang or confuse the coordinator)
            raise ValueError(
                "multi-host run needs a distinct process id per host: set "
                "tpu.multihost.process_id or JAX_PROCESS_ID"
            )
        else:
            process_id = 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
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
            addr, nproc if nproc > 0 else None, pid if pid >= 0 else None,
            strict=True,
        )
    elif addr or nproc > 0 or env_addr or env_nproc:
        init_distributed(
            addr, nproc if nproc > 0 else None, pid if pid >= 0 else None
        )


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    files, trace copy-back). Always True single-process."""
    return jax.process_index() == 0


def broadcast_int(value: int) -> int:
    """The primary process's value, on every process. Host-level
    agreement for draws that MUST match across hosts (unseeded RNG
    seeds: per-process divergence would stitch inconsistent shards
    through put_global). No-op single-process."""
    if jax.process_count() <= 1:
        return int(value)
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(np.int64(value)))


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


@functools.lru_cache(maxsize=64)
def _stack_replicator(sharding, n):
    """One cached jitted stack+replicate per (target sharding, chunk
    size): gathers a whole chunk of same-shaped leaves in ONE collective
    dispatch instead of one per leaf."""
    import jax.numpy as jnp

    return jax.jit(lambda xs: jnp.stack(xs), out_shardings=sharding)


def fetch_global(tree):
    """jax.device_get that also works for arrays sharded across
    processes: non-addressable shards are first replicated (an
    all-gather over DCN), then pulled. Same-shaped leaves batch into
    chunked stack dispatches — an epoch's per-batch scalar metrics would
    otherwise pay thousands of individual DCN collectives. Collective —
    every process must call it at the same point."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.sharding import NamedSharding, PartitionSpec as P

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: dict = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            key = (x.sharding.mesh, x.shape, str(x.dtype))
            groups.setdefault(key, []).append(i)
    CHUNK = 256  # bounds program arity (compile cost) per dispatch
    for (mesh, _, _), members in groups.items():
        target = NamedSharding(mesh, P())
        for c in range(0, len(members), CHUNK):
            chunk = members[c:c + CHUNK]
            if len(chunk) == 1:
                host = jax.device_get(_replicator(target)(leaves[chunk[0]]))
                leaves[chunk[0]] = host
                continue
            stacked = _stack_replicator(target, len(chunk))(
                tuple(leaves[i] for i in chunk)
            )
            host = jax.device_get(stacked)  # one fetch for the chunk
            for j, i in enumerate(chunk):
                leaves[i] = host[j]
    return jax.device_get(jax.tree_util.tree_unflatten(treedef, leaves))
