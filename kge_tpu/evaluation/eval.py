"""Evaluation job base (reference: kge/job/eval.py)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models import KgeModel
from kge_tpu.parallel.mesh import resolve_device
from kge_tpu.train.job import Job, TrainingOrEvaluationJob
from kge_tpu.utils.misc import init_from


class EvaluationJob(TrainingOrEvaluationJob):
    def __init__(self, config: Config, dataset: Dataset, parent_job=None,
                 model: Optional[KgeModel] = None):
        super().__init__(config, dataset, parent_job)
        self.device = resolve_device(config)
        if model is None:
            self.model = KgeModel.create(config, dataset, init_for_load_only=True)
        else:
            self.model = model
        self.batch_size = config.get("eval.batch_size")
        self.eval_split = config.get("eval.split")
        self.trace_examples = config.get("eval.trace_level") == "example"
        self.epoch = -1
        # parameter source: either set directly or shared from a training job
        self.params = None
        self.model_state = None
        self._training_job = None
        self.hist_hooks = []
        self.verbose = True

    def share_params(self, training_job):
        """Evaluate the live parameters of a (running) training job."""
        self._training_job = training_job

    def set_params(self, params, model_state=None):
        self.params = params
        self.model_state = model_state or self.model.init_state()

    def _current_params(self):
        if self._training_job is not None:
            # chunked sparse tables concatenate back into whole [V, D]
            # tables for eval (model forwards gather from whole tables;
            # the concat is a read-only dense op, safe at any size)
            return (
                self._training_job.dechunk_params(self._training_job.params),
                self._training_job.model_state,
            )
        if self.params is None:
            raise ValueError(
                "no parameters: call set_params() or share_params() first"
            )
        return self.params, self.model_state

    @staticmethod
    def create(config: Config, dataset: Dataset, parent_job=None,
               model: Optional[KgeModel] = None) -> "EvaluationJob":
        eval_type = config.get("eval.type")
        class_name = config.get_default(eval_type + ".class_name")
        return init_from(
            class_name, config.modules(), config, dataset,
            parent_job=parent_job, model=model,
        )

    def _run(self) -> Dict[str, Any]:
        self._evaluate()
        epoch_trace = self.current_trace["epoch"]
        self.current_trace["epoch"] = None

        # compute custom metric expression if the configured metric is
        # missing (reference: kge/job/eval.py:69-76)
        metric_name = self.config.get("valid.metric")
        if metric_name not in epoch_trace:
            import math

            epoch_trace[metric_name] = eval(
                self.config.get("valid.metric_expr"),
                None,
                {"config": self.config, "math": math, **epoch_trace},
            )
        epoch_trace = self.trace(**epoch_trace, echo=self.verbose, log=True)
        from kge_tpu.utils.trace import format_trace_entry

        line = format_trace_entry("eval_epoch", epoch_trace, self.config)
        if line:
            self.config.log(line)
        return epoch_trace

    def _evaluate(self):
        """Fill self.current_trace['epoch']."""
        raise NotImplementedError

    def _load(self, checkpoint: Dict):
        if checkpoint["type"] not in ["train", "package"]:
            raise ValueError("can only evaluate train/package checkpoints")
        with jax.default_device(self.device):
            params = jax.tree_util.tree_map(
                jnp.asarray, checkpoint["model"]["params"]
            )
            state = jax.tree_util.tree_map(
                jnp.asarray, checkpoint["model"].get("state", {})
            )
        self.set_params(params, state)
        self.epoch = checkpoint.get("epoch", -1)
        self.resumed_from_job_id = checkpoint.get("job_id")
        self.trace(event="job_resumed", checkpoint_file=checkpoint.get("file"))
