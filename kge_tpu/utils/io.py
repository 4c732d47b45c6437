"""Checkpoint I/O.

Checkpoints are single files ``checkpoint_{epoch:05d}.pt`` /
``checkpoint_best.pt`` (same naming contract as the reference,
kge/config.py:494-530) holding a pickled dict of numpy arrays plus
metadata — loadable on any host without devices.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

from kge_tpu.config import Config


def get_checkpoint_file(config: Config, checkpoint_argument: str = "default"
                        ) -> Optional[str]:
    """Resolve which checkpoint to use: 'best' for eval jobs if present,
    else the last numbered one (reference: kge/util/io.py:7-33). With
    'default' and no checkpoint on disk, returns None — the caller
    creates the job fresh from the saved config (how resuming a SEARCH
    folder works: search folders hold no checkpoints of their own, the
    job re-collects finished trials from the trial subfolders). Eval
    jobs still error: evaluating random init is never what was asked."""
    if checkpoint_argument == "default":
        if config.get("job.type") in ["eval", "valid", "test"]:
            checkpoint_file = config.checkpoint_file("best")
            if os.path.isfile(checkpoint_file):
                return checkpoint_file
        epoch = config.last_checkpoint_number()
        if epoch is not None:
            return config.checkpoint_file(epoch)
        if config.get("job.type") in ["eval", "valid", "test"]:
            raise FileNotFoundError(f"no checkpoint found in {config.folder}")
        return None
    if checkpoint_argument == "last":
        epoch = config.last_checkpoint_number()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint found in {config.folder}")
        return config.checkpoint_file(epoch)
    return config.checkpoint_file(checkpoint_argument)


def load_checkpoint(checkpoint_file: str, device: Optional[str] = None
                    ) -> Dict[str, Any]:
    with open(checkpoint_file, "rb") as f:
        checkpoint = pickle.load(f)
    checkpoint["file"] = checkpoint_file
    checkpoint["folder"] = os.path.dirname(checkpoint_file)
    return checkpoint


def save_checkpoint(checkpoint_file: str, checkpoint: Dict[str, Any]):
    tmp = checkpoint_file + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(checkpoint, f)
    os.replace(tmp, checkpoint_file)
