"""Hyperparameter search jobs (reference: kge/job/search*.py).

The reference's entire distributed story is a process pool running one
training job per device (SURVEY.md section 2.5); here trials run either
inline (num_workers=1, the common TPU case: one trial per slice) or in a
spawn-context process pool with a round-robin device pool. Coordination
is by futures + trace files, exactly as in the reference.
"""

from __future__ import annotations

import concurrent.futures
import copy
import gc
import os
from typing import Any, Dict, List, Optional

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.train.job import Job
from kge_tpu.utils.metric import Metric
from kge_tpu.utils.misc import init_from


class SearchJob(Job):
    """Base: manages a pool of training-job tasks."""

    def __init__(self, config: Config, dataset: Dataset, parent_job=None):
        super().__init__(config, dataset, parent_job)
        self.num_workers = self.config.get("search.num_workers")
        self.device_pool: List[str] = list(self.config.get("search.device_pool"))
        if len(self.device_pool) == 0:
            self.device_pool = [self.config.get("job.device")]
        if len(self.device_pool) < self.num_workers:
            self.device_pool = (
                self.device_pool * self.num_workers
            )[: self.num_workers]
        self.on_error = self.config.check(
            "search.on_error", ["abort", "continue"]
        )
        self.running_tasks = set()
        self.ready_task_results: List[Any] = []
        if self.num_workers > 1:
            import multiprocessing as mp

            self.process_pool = concurrent.futures.ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("spawn"),
            )
        else:
            self.process_pool = None

    @staticmethod
    def create(config: Config, dataset: Dataset, parent_job=None) -> "SearchJob":
        search_type = config.get("search.type")
        class_name = config.get_default(search_type + ".class_name")
        return init_from(
            class_name, config.modules(), config, dataset, parent_job=parent_job
        )

    def submit_task(self, task, task_arg, wait_when_full: bool = True):
        """Run task now (inline) or submit to the pool, assigning a device."""
        if self.process_pool is None:
            self.ready_task_results.append(task(task_arg))
        else:
            if len(self.running_tasks) >= self.num_workers and wait_when_full:
                self.wait_task()
            future = self.process_pool.submit(task, task_arg)
            self.running_tasks.add(future)

    def wait_task(self, return_when=concurrent.futures.FIRST_COMPLETED):
        """Wait for one or more running tasks to complete."""
        if len(self.running_tasks) > 0:
            done, self.running_tasks = concurrent.futures.wait(
                self.running_tasks, return_when=return_when
            )
            self.ready_task_results.extend(f.result() for f in done)

    # ------------------------------------------------------------ train trial

    def _run_train_job(self, sicnk) -> Dict[str, Any]:
        """Run/resume one training trial; returns (index, best entry)
        (reference: kge/job/search.py:107-232)."""
        search_job, train_job_index, train_job_config, train_job_count, trace_keys = sicnk
        try:
            os.makedirs(train_job_config.folder, exist_ok=True)
            train_job_config.init_folder()
            config = train_job_config
            config.log(
                f"Starting training job {train_job_index + 1} "
                f"of {train_job_count}..."
            )
            checkpoint_file = None
            epoch = config.last_checkpoint_number()
            if epoch is not None:
                checkpoint_file = config.checkpoint_file(epoch)
            if checkpoint_file is not None:
                from kge_tpu.utils.io import load_checkpoint

                checkpoint = load_checkpoint(checkpoint_file)
                job = Job.create_from(
                    checkpoint, new_config=config, dataset=self.dataset,
                    parent_job=self,
                )
            else:
                job = Job.create(config, self.dataset, parent_job=self)

            # copy the trial's validation results into the search trace
            hyperparameters = {key: config.get_default(key) for key in trace_keys}

            def copy_to_search_trace(train_job):
                if not train_job.valid_trace:
                    return
                entry = dict(train_job.valid_trace[-1])
                entry.update(
                    dict(
                        folder=os.path.basename(config.folder),
                        train_job_index=train_job_index,
                        scope="train",
                        **hyperparameters,
                    )
                )
                self.config.trace(**entry)

            job.post_valid_hooks.append(copy_to_search_trace)
            job.run()

            # find best epoch
            metric_name = self.config.get("valid.metric")
            if job.valid_trace:
                metric = Metric(self)
                values = [t[metric_name] for t in job.valid_trace]
                best_index = metric.best_index(values)
                best = dict(job.valid_trace[best_index])
            else:
                best = {}
            del job
            gc.collect()
            return (train_job_index, best, best.get(metric_name))
        except BaseException as e:
            self.config.log(f"Trial {train_job_index} failed: {e!r}")
            if self.on_error == "continue":
                return (train_job_index, None, None)
            raise
