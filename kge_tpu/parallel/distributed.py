"""Multi-host initialization and hybrid ICI/DCN meshes.

The reference has no distributed communication backend at all (SURVEY.md
section 2.5); this module is the new framework's first-class comm layer:
``jax.distributed`` process bootstrap plus meshes whose "model" axis
stays inside a slice (collectives ride ICI) while "data" may span slices
over DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from kge_tpu.config import Config


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the TPU pod metadata when available). Idempotent."""
    if jax.process_count() > 1:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # single-process run or TPU pod auto-bootstrap
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", 0)
        ),
    )


def build_hybrid_mesh(config: Config, devices=None):
    """Mesh whose 'model' axis is contained within a slice/host (ICI) and
    whose 'data' axis spans slices (DCN) — vocabulary-sharded gathers and
    rank-count psums stay on ICI, gradient all-reduce crosses DCN."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    data = config.get("tpu.mesh.data")
    model = config.get("tpu.mesh.model")
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        data = max(1, n // max(model, 1))
    if data * model == 1:
        return None
    if jax.process_count() > 1:
        # keep model inside a process's devices; data across processes
        per_process = n // jax.process_count()
        if model > per_process:
            raise ValueError(
                f"model axis {model} exceeds per-host device count "
                f"{per_process}; model sharding must stay on ICI"
            )
        if data % jax.process_count() != 0:
            raise ValueError(
                f"data axis {data} must divide across "
                f"{jax.process_count()} processes"
            )
        dev_array = mesh_utils.create_hybrid_device_mesh(
            (data // jax.process_count(), model),
            dcn_mesh_shape=(jax.process_count(), 1),
            devices=devices,
        )
        return Mesh(
            dev_array.reshape(data, model), axis_names=("data", "model")
        )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))
