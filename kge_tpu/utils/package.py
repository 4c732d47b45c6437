"""``kge package``: strip a train checkpoint to a distributable artifact
containing model params + config + id maps (reference:
kge/util/package.py). Loadable via ``KgeModel.create_from``."""

from __future__ import annotations

import os
from typing import Optional

from kge_tpu.utils.io import load_checkpoint, save_checkpoint


def package_model(checkpoint_file: str, output_file: Optional[str] = None) -> str:
    from kge_tpu.config import Config
    from kge_tpu.dataset import Dataset

    checkpoint = load_checkpoint(checkpoint_file)
    if checkpoint["type"] != "train":
        raise ValueError("can only package train checkpoints")
    packaged = {
        "type": "package",
        "model": checkpoint["model"],
        "config": checkpoint["config"],
        "epoch": checkpoint.get("epoch"),
        "job_id": checkpoint.get("job_id"),
        "valid_trace": checkpoint.get("valid_trace"),
    }
    # embed the entity/relation id maps so the package is standalone —
    # KgeModel.create_from and entity_strings() work with the dataset
    # folder gone (reference: kge/util/package.py:38)
    config = Config.create_from(checkpoint)
    dataset = Dataset.create_from(checkpoint, config, preload_data=False)
    dataset.entity_ids()
    dataset.relation_ids()
    dataset.save_to(packaged, ["entity_ids", "relation_ids"])
    if output_file is None:
        folder = os.path.dirname(checkpoint_file)
        output_file = os.path.join(folder, "model.pt")
    save_checkpoint(output_file, packaged)
    print(f"Packaged model written to {output_file}")
    return output_file
