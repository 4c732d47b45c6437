"""Shared test helpers (mirrors the role of the reference's tests/util.py)."""

import os

from kge_tpu import Config


def get_dataset_folder(dataset_name: str) -> str:
    return os.path.join(os.path.dirname(__file__), "data", dataset_name)


def create_config(dataset_name: str, model: str = "complex") -> Config:
    config = Config()
    config.folder = None
    config.set("model", model)
    config._import(model)
    config.set("verbose", False, create=True)
    config.set("job.device", "cpu")
    config.set("dataset.name", dataset_name)
    return config
