"""Training job base: host epoch loop around one compiled train step.

Re-design of the reference training driver (reference: kge/job/train.py):
the epoch loop, validation, early stopping, LR control, and checkpoint
rotation stay host-side and match the reference's semantics; the per-batch
work (forward, loss, penalties, backward, optimizer update, parameter
constraints) is ONE jitted function per training strategy with donated
buffers and static shapes:

- every batch is padded to ``train.batch_size`` with zero-weight rows, so
  the step compiles exactly once per epoch shape
- ``train.subbatch_size`` becomes in-step gradient accumulation (a static
  Python loop over subbatch slices inside the traced function), which is
  bit-identical to the reference's split forward/backward
- learning rates enter as traced scalars (no recompile on LR changes)
- NaN checking and metric reads sync with the device once per epoch, not
  per batch
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models import Ctx, KgeModel
from kge_tpu.parallel.mesh import resolve_device
from kge_tpu.train.job import Job, TrainingOrEvaluationJob
from kge_tpu.train.loss import KgeLoss
from kge_tpu.train.optimizer import KgeLRScheduler, KgeOptimizer
from kge_tpu.utils.io import save_checkpoint
from kge_tpu.utils.metric import Metric
from kge_tpu.utils.misc import init_from
from kge_tpu.utils.seed import rng_seed_from_config


def _prefetch(gen, depth: int):
    """Run a batch generator in a producer thread so host collate
    (sampling, label coords) overlaps device dispatch. Single producer,
    single consumer: ordering and RNG draws are identical to serial."""
    if depth <= 0:
        yield from gen
        return
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    errors = []

    def put(item) -> bool:
        """Bounded put that aborts when the consumer is gone (an
        abandoned mid-epoch generator — hook exception, Ctrl-C — must
        not leave this thread blocked forever holding pinned batches)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not put(item):
                    return
        except BaseException as e:  # re-raised on the consumer side
            errors.append(e)
        finally:
            put(sentinel)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()
        try:  # unblock a producer mid-put and drop its pinned batches
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class TrainingJob(TrainingOrEvaluationJob):
    """Abstract base for training strategies."""

    def __init__(self, config: Config, dataset: Dataset, parent_job: Job = None,
                 model: Optional[KgeModel] = None, forward_only: bool = False):
        super().__init__(config, dataset, parent_job)
        # multi-host bootstrap must precede the first backend touch
        from kge_tpu.parallel import distributed as dist

        dist.maybe_init_from_config(config)
        if jax.process_count() > 1:
            # every process must agree on folder-ness: checkpoint saves
            # gather collectively before the primary writes, so one
            # process skipping _save (folder None) while another enters
            # it would deadlock; resume likewise requires one SHARED
            # folder so all processes load the primary's checkpoint
            from jax.experimental import multihost_utils

            has_folder = np.asarray(
                [1 if config.folder else 0], dtype=np.int32
            )
            all_flags = multihost_utils.process_allgather(has_folder)
            if int(all_flags.min()) != int(all_flags.max()):
                raise ValueError(
                    "multi-host runs must set a folder on every process "
                    "or on none (use one SHARED folder: process 0 writes "
                    "checkpoints, every process resumes from it)"
                )
            if config.folder and not dist.is_primary():
                # non-primary processes keep their logs/trace out of the
                # shared kge.log/trace.yaml (no file-level interleaving);
                # checkpoints stay primary-only in _save
                config.log_folder = os.path.join(
                    config.folder, f"proc{jax.process_index()}"
                )
                os.makedirs(config.log_folder, exist_ok=True)
        self.device = resolve_device(config)
        jax.config.update(
            "jax_default_matmul_precision",
            config.check("tpu.matmul_precision", ["default", "high", "highest"]),
        )
        if model is None:
            self.model = KgeModel.create(config, dataset)
        else:
            self.model = model
        self.loss = KgeLoss.create(config)
        self.batch_size: int = config.get("train.batch_size")
        self.subbatch_size: int = config.get("train.subbatch_size")
        self.train_split: str = config.get("train.split")
        self.is_forward_only = forward_only
        self.epoch = 0
        self.valid_trace: List[Dict[str, Any]] = []
        self.abort_on_nan: bool = config.get("train.abort_on_nan")
        self.type_str = "generic"
        self.post_valid_hooks: List[Callable] = []

        # parameter/optimizer state
        seed = rng_seed_from_config(config, "jax")
        if seed < 0:
            seed = int.from_bytes(os.urandom(4), "little")
            if jax.process_count() > 1:
                # every process must agree or put_global stitches shards
                # of DIFFERENT initializations into one "global" array
                from kge_tpu.parallel.distributed import broadcast_int

                seed = broadcast_int(seed)
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(self.rng)
        with jax.default_device(self.device):
            self.params = self.model.init_params(init_rng)
            self.params = self.model.normalize_params(self.params)
            self.model_state = self.model.init_state()

        # multi-device mesh: vocab-shard embedding tables over "model",
        # shard batches over "data"; GSPMD inserts the collectives
        from kge_tpu.parallel.mesh import build_mesh, params_sharding

        self.mesh = build_mesh(config)
        self._batch_shardings = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_size = self.mesh.shape["data"]
            if self.batch_size % data_size != 0:
                new_size = ((self.batch_size + data_size - 1)
                            // data_size) * data_size
                config.log(
                    f"Rounding train.batch_size up to {new_size} to divide "
                    f"the data mesh axis ({data_size})."
                )
                self.batch_size = new_size
                config.set("train.batch_size", new_size)
            self.params = jax.tree_util.tree_map(
                lambda a, s: dist.put_global(np.asarray(a), s),
                self.params, params_sharding(self.mesh, self.params),
            )
            self.model_state = jax.tree_util.tree_map(
                lambda a: dist.put_global(
                    np.asarray(a), NamedSharding(self.mesh, P())
                ),
                self.model_state,
            )
            config.log(
                f"Using mesh {dict(self.mesh.shape)} over "
                f"{self.mesh.devices.size} devices"
            )
        # row-chunked tables for sparse training: _sparse_table_paths
        # (strategy override) fills _table_chunks when a table exceeds
        # tpu.sparse_scatter_limit_bytes (see train/chunking.py)
        self._table_chunks: Dict[str, int] = {}
        self._table_rows: Dict[str, int] = {}
        self._sparse_paths = () if forward_only else tuple(
            self._sparse_table_paths()
        )
        if self._chunked():
            from kge_tpu.train.chunking import chunk_tree

            for path in self._table_chunks:
                node = self.params
                for part in path.split("."):
                    node = node[part]
                self._table_rows[path] = int(node.shape[0])
            with jax.default_device(self.device):
                self.params = chunk_tree(self.params, self._table_chunks)
            config.log(
                "Row-chunked sparse tables: "
                + ", ".join(f"{p} x{k}"
                            for p, k in self._table_chunks.items() if k > 1)
            )
        self.optimizer = KgeOptimizer(
            config, self.params, sparse_paths=self._sparse_paths
        )
        if forward_only:
            self.opt_state = None
        elif jax.process_count() > 1:
            # eager ops on cross-process shards are rejected; init under
            # jit so the zeros inherit the params' sharding
            self.opt_state = jax.jit(self.optimizer.init)(self.params)
        else:
            self.opt_state = self.optimizer.init(self.params)
        self.lr_scheduler = KgeLRScheduler(config)
        np_seed = rng_seed_from_config(config, "numpy")
        if np_seed < 0 and jax.process_count() > 1:
            # same agreement requirement for batch order / negatives
            from kge_tpu.parallel.distributed import broadcast_int

            np_seed = broadcast_int(int.from_bytes(os.urandom(4), "little"))
        self._np_seed = np_seed
        self._np_rng = np.random.default_rng(np_seed if np_seed >= 0 else None)

        self._train_step = None  # compiled lazily per strategy
        self._group_steps: Dict[int, Callable] = {}  # k -> scanned step

        if not self.is_forward_only:
            from kge_tpu.evaluation.eval import EvaluationJob

            valid_conf = config.clone()
            valid_conf.set("job.type", "eval")
            valid_conf.set(
                "eval.split",
                config.get("valid.split") or config.get("eval.split"),
            )
            valid_conf.set("eval.trace_level", config.get("valid.trace_level"))
            self.valid_job = EvaluationJob.create(
                valid_conf, dataset, parent_job=self, model=self.model
            )
            self.valid_job.share_params(self)
        self.model.prepare_job(self)

    # ------------------------------------------------------------------ factory

    @staticmethod
    def create(config: Config, dataset: Dataset, parent_job: Job = None,
               model: Optional[KgeModel] = None,
               forward_only: bool = False) -> "TrainingJob":
        train_type = config.get("train.type")
        class_name = config.get_default(train_type + ".class_name")
        return init_from(
            class_name, config.modules(), config, dataset,
            parent_job=parent_job, model=model, forward_only=forward_only,
        )

    # ------------------------------------------------------------------ strategy API

    def _sparse_table_paths(self):
        """Dotted param paths of embedding tables whose gradients are
        row-sparse in this strategy (overridden by negative sampling);
        () keeps the fully dense optimizer path."""
        return ()

    # ------------------------------------------------------------------ chunked tables

    def _chunked(self) -> bool:
        return any(k > 1 for k in self._table_chunks.values())

    def dechunk_params(self, params):
        """A de-chunked VIEW of (possibly chunked) params: chunk tuples
        concatenated back into [V, D] tables. Identity when no table is
        chunked. Used by eval (model forwards expect whole tables) and
        checkpointing (the on-disk format stays un-chunked)."""
        if not self._chunked():
            return params
        from kge_tpu.train.chunking import dechunk_tree

        return dechunk_tree(params, self._table_chunks, self._table_rows)

    def _chunk_params_tree(self, params):
        if not self._chunked():
            return params
        from kge_tpu.train.chunking import chunk_tree

        return chunk_tree(params, self._table_chunks)

    def _dechunk_opt_state(self, opt_state):
        if not self._chunked() or not opt_state:
            return opt_state
        from kge_tpu.train.chunking import dechunk_table

        sparse = {
            path: {
                k: (dechunk_table(v, self._table_rows[path])
                    if k == "sum" else v)
                for k, v in st.items()
            }
            for path, st in opt_state["sparse"].items()
        }
        return {**opt_state, "sparse": sparse}

    def _chunk_opt_state(self, opt_state):
        if not self._chunked() or not opt_state:
            return opt_state
        from kge_tpu.train.chunking import chunk_table

        sparse = {
            path: {
                k: (chunk_table(jnp.asarray(v),
                                self._table_chunks.get(path, 1))
                    if k == "sum" else v)
                for k, v in st.items()
            }
            for path, st in opt_state["sparse"].items()
        }
        return {**opt_state, "sparse": sparse}

    def _prepare(self):
        """Subclasses set self.num_examples and any precomputed indexes."""
        raise NotImplementedError

    def _generate_batches(self, epoch: int):
        """Yield per-batch numpy dicts (padded to static shapes)."""
        raise NotImplementedError

    def _epoch_np_rng(self, epoch: int) -> np.random.Generator:
        """Host RNG for epoch-scoped draws (batch order, sampled
        subgraphs, negatives), derived from (seed, epoch) rather than
        consumed from one stateful stream: epoch k draws identically
        whether the process trained from epoch 1 or resumed from a
        checkpoint at k-1, so a kill/resume reproduces the
        uninterrupted run's loss trajectory bit-for-bit (the host RNG
        state is not checkpointable the way device PRNG keys are).
        Unseeded jobs keep the shared stream — freshness over
        reproducibility."""
        if self._np_seed < 0:
            return self._np_rng
        return np.random.default_rng((self._np_seed, epoch))

    def _num_batches(self) -> int:
        return math.ceil(self.num_examples / self.batch_size)

    def _subbatch_loss(self, params, ctx: Ctx, batch: Dict[str, jnp.ndarray],
                       sub_slice: slice) -> jnp.ndarray:
        """Loss sum of the given subbatch, already divided by batch size."""
        raise NotImplementedError

    def _penalty_batch(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        if "triples" in batch:
            return {"triples": batch["triples"]}
        return {}

    def _expand_device_batch(self, batch: Dict[str, jnp.ndarray], rng
                             ) -> Dict[str, jnp.ndarray]:
        """Strategy hook: materialize batch content on device from a
        lightweight host payload (e.g. on-device negative sampling).
        Runs inside the jitted step, once per batch, before subbatching
        — so, like the host collate, one draw is shared across
        subbatches. Default: the host payload already is the batch."""
        return batch

    # ------------------------------------------------------------------ compiled step

    def _subbatch_slices(self) -> List[slice]:
        size = self.batch_size
        sub = self.subbatch_size if self.subbatch_size > 0 else size
        return [slice(i, min(i + sub, size)) for i in range(0, size, sub)]

    def _build_train_step(self) -> Callable:
        donate = (0, 1, 2) if self.config.get("tpu.donate_buffers") else ()
        return jax.jit(self._make_step_fn(), donate_argnums=donate)

    def _stack_group_batches(self, buffered: List[Dict[str, np.ndarray]]
                             ) -> Dict[str, np.ndarray]:
        """Stack k host batches into one grouped-dispatch payload
        (leading axis k). Strategies may add GROUP-LEVEL keys (no k
        axis) consumed by their _build_group_step."""
        return {
            key: np.stack([b[key] for b in buffered])
            for key in buffered[0]
        }

    def _build_group_step(self, k: int) -> Callable:
        """K train steps scanned inside ONE compiled dispatch. Dispatch
        and host->device marshaling cost a few ms per call (much more
        over remote-attached transports); amortizing them over k batches
        makes the epoch loop device-bound. Math is identical to k
        per-batch dispatches (same per-batch RNG fold)."""
        step_fn = self._make_step_fn()

        def many(params, opt_state, model_state, stacked, lrs, rng,
                 start_index):
            def body(carry, i):
                params, opt_state, model_state = carry
                batch = jax.tree_util.tree_map(
                    lambda v: jax.lax.dynamic_index_in_dim(
                        v, i, keepdims=False
                    ),
                    stacked,
                )
                step_rng = jax.random.fold_in(rng, start_index + i)
                params, opt_state, model_state, metrics = step_fn(
                    params, opt_state, model_state, batch, lrs, step_rng
                )
                return (params, opt_state, model_state), metrics

            (params, opt_state, model_state), metrics = jax.lax.scan(
                body, (params, opt_state, model_state),
                jnp.arange(k, dtype=jnp.int32),
            )
            return params, opt_state, model_state, metrics

        donate = (0, 1, 2) if self.config.get("tpu.donate_buffers") else ()
        return jax.jit(many, donate_argnums=donate)

    def _build_epoch_group_step(self, k: int) -> Callable:
        """Like ``_build_group_step``, but over a DEVICE-RESIDENT
        whole-epoch payload: the stacked arrays hold all M batches of
        the epoch and stay on device across dispatches; each dispatch
        scans batches [start, start+k). With on-device negative
        sampling the host then ships ONE scalar per dispatch instead of
        k batch payloads, removing the per-batch host collate/stack/
        transfer cost from the epoch loop entirely (the residual e2e
        gap after grouped dispatch was pure host-side Python). Math is
        identical to the per-batch loop: same (start+i) RNG fold."""
        step_fn = self._make_step_fn()

        def many(params, opt_state, model_state, epoch_payload, lrs, rng,
                 start_index):
            def body(carry, i):
                params, opt_state, model_state = carry
                batch = jax.tree_util.tree_map(
                    lambda v: jax.lax.dynamic_index_in_dim(
                        v, start_index + i, keepdims=False
                    ),
                    epoch_payload,
                )
                step_rng = jax.random.fold_in(rng, start_index + i)
                params, opt_state, model_state, metrics = step_fn(
                    params, opt_state, model_state, batch, lrs, step_rng
                )
                return (params, opt_state, model_state), metrics

            (params, opt_state, model_state), metrics = jax.lax.scan(
                body, (params, opt_state, model_state),
                jnp.arange(k, dtype=jnp.int32),
            )
            return params, opt_state, model_state, metrics

        donate = (0, 1, 2) if self.config.get("tpu.donate_buffers") else ()
        return jax.jit(many, donate_argnums=donate)

    def _epoch_device_payload(self, epoch: int):
        """Strategy hook: the whole epoch as ONE stacked host payload
        ``{key: [M, ...]}`` (M = number of batches) for device-resident
        grouped dispatch, or None when the strategy must collate each
        batch on the host. Only cheap, small-payload strategies
        implement it (on-device negative sampling ships [M, B] int32
        positives and [M] sizes)."""
        return None

    def _steps_per_dispatch(self) -> int:
        group = int(self.config.get("tpu.steps_per_dispatch"))
        if group <= 1:
            return 1
        if self.pre_batch_hooks or self.post_batch_hooks:
            return 1  # hooks observe real batch boundaries
        return group

    def _make_step_fn(self) -> Callable:
        """The pure (un-jitted) train step; benchmark harnesses scan it."""
        model = self.model
        optimizer = self.optimizer
        slices = self._subbatch_slices()
        forward_only = self.is_forward_only

        def step(params, opt_state, model_state, batch, lrs, rng):
            batch = self._expand_device_batch(batch, rng)
            total_loss = 0.0
            new_model_state = model_state
            if forward_only:
                for i, sl in enumerate(slices):
                    ctx = Ctx(train=True, rng=jax.random.fold_in(rng, i),
                              state=model_state)
                    total_loss = total_loss + self._subbatch_loss(
                        params, ctx, batch, sl
                    )
                metrics = {"avg_loss": total_loss, "avg_penalty": 0.0,
                           "avg_cost": total_loss}
                return params, opt_state, model_state, metrics

            grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            for i, sl in enumerate(slices):
                def loss_fn(p, i=i, sl=sl):
                    ctx = Ctx(train=True, rng=jax.random.fold_in(rng, i),
                              state=model_state)
                    value = self._subbatch_loss(p, ctx, batch, sl)
                    return value, ctx.updates
                (value, updates), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                grads = jax.tree_util.tree_map(jnp.add, grads, g)
                total_loss = total_loss + value
                if updates:
                    new_model_state = {**new_model_state, **updates}

            def penalty_fn(p):
                ctx = Ctx(train=True, rng=jax.random.fold_in(rng, 7919),
                          state=model_state)
                terms = model.penalties(
                    p, ctx, batch=self._penalty_batch(batch)
                )
                total = 0.0
                for _, v in terms:
                    total = total + v
                return total, dict(terms)

            (penalty_total, penalty_dict), pg = jax.value_and_grad(
                penalty_fn, has_aux=True
            )(params)
            grads = jax.tree_util.tree_map(jnp.add, grads, pg)
            params, opt_state = optimizer.apply_updates(
                params, grads, opt_state, lrs
            )
            params = model.normalize_params(params)
            metrics = {
                "avg_loss": total_loss,
                "avg_penalty": penalty_total,
                "avg_cost": total_loss + penalty_total,
                **{f"avg_penalty_{k}": v for k, v in penalty_dict.items()},
            }
            return params, opt_state, new_model_state, metrics

        return step

    # ------------------------------------------------------------------ run

    def run(self) -> Dict[str, Any]:
        """Epoch loop with validation, early stopping, LR scheduling, and
        checkpoint rotation (reference: kge/job/train.py:139-254)."""
        if not self._is_prepared:
            self._prepare()
            self._is_prepared = True

        for f in self.pre_run_hooks:
            f(self)

        self.config.log(f"Starting training ({self.type_str})...")
        checkpoint_every = self.config.get("train.checkpoint.every")
        checkpoint_keep = self.config.get("train.checkpoint.keep")
        metric_name = self.config.get("valid.metric")
        patience = self.config.get("valid.early_stopping.patience")

        if (self.epoch == 0 and not self.is_forward_only
                and self.config.folder):
            self._save(self.config.checkpoint_file(0))

        while True:
            # should we stop?
            if self.epoch >= self.config.get("train.max_epochs"):
                self.config.log("Maximum number of epochs reached.")
                break
            if len(self.valid_trace) > 0 and patience > 0:
                values = [t[metric_name] for t in self.valid_trace]
                # the reference stops when the best value FIRST occurred
                # more than `patience` validations ago (kge/job/train.py
                # best_index semantics) — a plateau of exact ties counts
                # as no improvement, not as fresh bests
                best_idx = Metric(self).best_index(values)
                if (len(values) > patience
                        and best_idx < len(values) - patience):
                    self.config.log(
                        f"Stopping early ({patience} validations without "
                        "improvement)."
                    )
                    break
            th_epochs = self.config.get(
                "valid.early_stopping.threshold.epochs"
            )
            if len(self.valid_trace) > 0 and th_epochs > 0:
                th_value = self.config.get(
                    "valid.early_stopping.threshold.metric_value"
                )
                best = Metric(self).best(
                    [t[metric_name] for t in self.valid_trace]
                )
                if self.epoch >= th_epochs and Metric(self).better(
                    th_value, best
                ):
                    self.config.log(
                        "Stopping early (threshold not reached)."
                    )
                    break

            # run one epoch
            self.epoch += 1
            self.config.log(f"Starting epoch {self.epoch}...")
            trace_entry = self.run_epoch()
            self.config.log(f"Finished epoch {self.epoch}.")

            # validate
            if (not self.is_forward_only
                    and self.config.get("valid.every") > 0
                    and self.epoch % self.config.get("valid.every") == 0):
                self.valid_job.epoch = self.epoch
                valid_entry = self.valid_job.run()
                self.valid_trace.append(valid_entry)
                for f in self.post_valid_hooks:
                    f(self)
                metric_value = valid_entry[metric_name]
                self.lr_scheduler.step(metric_value)
                # save best checkpoint
                best = Metric(self).best(
                    [t[metric_name] for t in self.valid_trace]
                )
                if metric_value == best and self.config.folder:
                    self._save(self.config.checkpoint_file("best"))
            elif not self.is_forward_only:
                self.lr_scheduler.step(None)

            # checkpoint rotation (reference: train.py:236-254)
            if not self.is_forward_only and self.config.folder:
                self._save(self.config.checkpoint_file(self.epoch))
                self._delete_obsolete_checkpoints(
                    checkpoint_every, checkpoint_keep
                )

        self.trace(event="train_completed", epoch=self.epoch)
        result = self.current_trace["epoch"] or {}
        for f in self.post_run_hooks:
            f(self, result)
        return result

    def _delete_obsolete_checkpoints(self, every: int, keep: int):
        if not self.config.folder:
            return
        from kge_tpu.parallel.distributed import is_primary

        if not is_primary():
            return  # shared folder: only the writer rotates
        keep_init = self.config.get("train.checkpoint.keep_init")
        for e in range(1 if keep_init else 0, self.epoch):
            keep_this = (
                every > 0 and e % every == 0
                and e > self.epoch - every * keep - 1
            )
            if not keep_this:
                path = self.config.checkpoint_file(e)
                if os.path.isfile(path):
                    os.remove(path)

    def run_epoch(self) -> Dict[str, Any]:
        profile_dir = self.config.get("tpu.profile_dir")
        profiling = bool(profile_dir) and self.epoch == 1
        if profiling:
            jax.profiler.start_trace(profile_dir)
        try:
            return self._run_epoch_inner()
        finally:
            if profiling:
                jax.profiler.stop_trace()
                self.config.log(f"Wrote device trace to {profile_dir}")

    def _run_epoch_inner(self) -> Dict[str, Any]:
        for f in self.pre_epoch_hooks:
            f(self)
        if self._train_step is None:
            self._train_step = self._build_train_step()

        lr_scale = self.lr_scheduler.lr_scale(self.epoch)
        lrs = {
            g: jnp.asarray(base * lr_scale, dtype=jnp.float32)
            for g, base in self.optimizer.base_lrs.items()
        }

        epoch_start = time.time()
        batch_metrics: List[Dict[str, jnp.ndarray]] = []
        num_batches = 0
        prepare_time = 0.0
        group_size = self._steps_per_dispatch()
        self.rng, epoch_rng = jax.random.split(self.rng)

        def flush(buffered, start_index):
            """Dispatch a group of host batches as one compiled call. A
            short remainder group reuses the per-batch step instead of
            compiling a second scanned program."""
            nonlocal prepare_time
            k = len(buffered)
            if self._train_step is None:
                # invalidated mid-epoch (e.g. per-epoch graph resampling)
                self._group_steps = {}
                self._train_step = self._build_train_step()
            if k == group_size and group_size > 1:
                t0 = time.time()
                stacked = self._stack_group_batches(buffered)
                # under a mesh, the batch axis (position 1 behind the
                # k-stack axis) shards over "data"
                batch = self._put_batch(stacked, stacked=True)
                prepare_time += time.time() - t0
                if k not in self._group_steps:
                    self._group_steps[k] = self._build_group_step(k)
                out = self._group_steps[k](
                    self.params, self.opt_state, self.model_state, batch,
                    lrs, epoch_rng, jnp.int32(start_index),
                )
                (self.params, self.opt_state, self.model_state,
                 metrics) = out
                sizes = np.asarray(
                    [float(b["size"]) for b in buffered], dtype=np.float64
                )
                batch_metrics.append((sizes, metrics))
                return
            for i, batch_np in enumerate(buffered):
                t0 = time.time()
                batch = self._put_batch(batch_np)
                prepare_time += time.time() - t0
                rng_arg = jax.random.fold_in(epoch_rng, start_index + i)
                out = self._train_step(
                    self.params, self.opt_state, self.model_state, batch,
                    lrs, rng_arg,
                )
                (self.params, self.opt_state, self.model_state,
                 metrics) = out
                batch_metrics.append((
                    np.asarray([float(batch_np["size"])], dtype=np.float64),
                    metrics,
                ))

        def signature(batch_np):
            return tuple(
                (key, np.shape(v), str(np.asarray(v).dtype))
                for key, v in sorted(batch_np.items())
            )

        resident_np = (
            self._epoch_device_payload(self.epoch)
            if group_size > 1
            # user-registered batch hooks expect per-batch cadence on
            # the host; the device-resident loop has no such points
            and not self.pre_batch_hooks and not self.post_batch_hooks
            else None
        )
        if resident_np is not None:
            # device-resident epoch: ship the whole (small) payload
            # once, then each dispatch carries only a scalar start index
            M = int(np.shape(resident_np["size"])[0])
            k = min(group_size, M)
            t0 = time.time()
            dev_payload = self._put_batch(resident_np, stacked=True)
            prepare_time += time.time() - t0
            key = ("epoch", k)
            if key not in self._group_steps:
                self._group_steps[key] = self._build_epoch_group_step(k)
            fn = self._group_steps[key]
            full = (M // k) * k
            for d in range(0, full, k):
                out = fn(
                    self.params, self.opt_state, self.model_state,
                    dev_payload, lrs, epoch_rng, jnp.int32(d),
                )
                (self.params, self.opt_state, self.model_state,
                 metrics) = out
                batch_metrics.append((
                    np.asarray(resident_np["size"][d:d + k],
                               dtype=np.float64),
                    metrics,
                ))
            num_batches = M
            if full < M:  # tail shorter than k: per-batch dispatches
                flush(
                    [
                        {key: v[j] for key, v in resident_np.items()}
                        for j in range(full, M)
                    ],
                    full,
                )
            return self._finish_epoch(
                batch_metrics, num_batches, prepare_time, epoch_start
            )

        buffered: List[Dict[str, np.ndarray]] = []
        buffered_sig = None
        depth = int(self.config.get("tpu.prefetch_batches"))
        if depth < 0:
            # auto: honor the reference's DataLoader-worker intent
            # (collate off the critical path when train.num_workers > 0);
            # 0 explicitly disables prefetch
            depth = min(2 * int(self.config.get("train.num_workers")), 8)
        batches = _prefetch(self._generate_batches(self.epoch), depth)
        for batch_index, batch_np in enumerate(batches):
            for f in self.pre_batch_hooks:
                f(self)
            # only batches with identical structure stack into one
            # dispatch (KvsAll interleaves query types with different
            # keys and bucketed label widths)
            sig = signature(batch_np) if group_size > 1 else None
            if buffered and sig != buffered_sig:
                flush(buffered, num_batches - len(buffered))
                buffered = []
            buffered.append(batch_np)
            buffered_sig = sig
            num_batches += 1
            if len(buffered) == group_size:
                flush(buffered, num_batches - len(buffered))
                buffered = []
            for f in self.post_batch_hooks:
                f(self)
        if buffered:
            flush(buffered, num_batches - len(buffered))
        if hasattr(self._train_step, "flush_pipeline"):
            # pipelined steps (split row-sparse updates) defer the last
            # batch's table update; apply it before anything (validation,
            # checkpointing) observes the parameters
            self.params, self.opt_state = self._train_step.flush_pipeline(
                self.params, self.opt_state, lrs
            )
        return self._finish_epoch(
            batch_metrics, num_batches, prepare_time, epoch_start
        )

    def _finish_epoch(self, batch_metrics, num_batches: int,
                      prepare_time: float, epoch_start: float
                      ) -> Dict[str, Any]:
        """Epoch epilogue shared by the host-collate and device-resident
        loops: fetch metrics, aggregate, trace."""
        # single device sync for the whole epoch (one bulk transfer; a
        # per-scalar float() would pay a dispatch round trip per metric)
        from kge_tpu.parallel.distributed import fetch_global

        batch_metrics = fetch_global(batch_metrics)
        # avg_* epoch metrics are example-weighted batch averages:
        # sum(batch_avg * true_batch_size) / num_examples, matching the
        # reference's aggregation (kge/job/train.py run_epoch) so a tail
        # batch shorter than train.batch_size does not skew the epoch
        # average
        sums: Dict[str, float] = {}
        total_size = 0.0
        for sizes, metrics in batch_metrics:
            total_size += float(np.sum(sizes))
            for key, v in metrics.items():
                arr = np.asarray(v, dtype=np.float64).reshape(-1)
                if arr.size == sizes.size:
                    weighted = float(np.sum(arr * sizes))
                else:  # scalar metric for a grouped dispatch
                    weighted = float(np.sum(arr)) * float(np.sum(sizes))
                sums[key] = sums.get(key, 0.0) + weighted
        epoch_time = time.time() - epoch_start

        if self.abort_on_nan and not math.isfinite(sums.get("avg_cost", 0.0)):
            raise FloatingPointError("training cost became NaN")

        trace_entry = dict(
            type=self.type_str,
            scope="epoch",
            epoch=self.epoch,
            split=self.train_split,
            batches=num_batches,
            size=self.num_examples,
            epoch_time=epoch_time,
            prepare_time=prepare_time,
            event="epoch_completed",
            **{k: v / max(total_size, 1.0) for k, v in sums.items()},
        )
        self.current_trace["epoch"] = trace_entry
        for f in self.post_epoch_hooks:
            f(self)
        self.trace(**trace_entry, echo=False, log=True)
        from kge_tpu.utils.trace import format_trace_entry

        line = format_trace_entry("train_epoch", trace_entry, self.config)
        if line:
            self.config.log(line)
        if self.config.get("train.trace_level") == "batch":
            batch_index = 0
            for sizes, metrics in batch_metrics:
                # grouped dispatches return stacked [k] metric arrays;
                # expand them back into one trace entry per real batch
                for j in range(sizes.size):
                    self.trace(
                        type=self.type_str, scope="batch", epoch=self.epoch,
                        batch=batch_index,
                        **{
                            key: float(np.asarray(v).reshape(-1)[j]
                                       if np.ndim(v) else v)
                            for key, v in metrics.items()
                        },
                    )
                    batch_index += 1
        return trace_entry

    # ------------------------------------------------------------------ checkpoints

    def _save(self, filename: str):
        if self.config.folder is None:
            return
        from kge_tpu.parallel import distributed as dist

        self.config.log(f"Saving checkpoint to {filename}...")
        # fetch_global is collective: every process gathers (aligned
        # program order), only the primary touches the filesystem.
        # Chunked tables de-chunk first: on-disk checkpoints always hold
        # whole [V, D] tables (load-compatible across chunk settings)
        params_np = dist.fetch_global(self.dechunk_params(self.params))
        state_np = dist.fetch_global(self.model_state)
        opt_np = dist.fetch_global(self._dechunk_opt_state(self.opt_state))
        if not dist.is_primary():
            dist.barrier(f"save:{os.path.basename(filename)}")
            return
        checkpoint = {
            "type": "train",
            "epoch": self.epoch,
            "valid_trace": self.valid_trace,
            "lr_scheduler": self.lr_scheduler.state_dict(),
            "job_id": self.job_id,
            "rng": np.asarray(self.rng),
            "opt_state": jax.tree_util.tree_map(np.asarray, opt_np),
        }
        self.model.save_to(checkpoint, params_np, state_np)
        self.config.save_to(checkpoint)
        self.dataset.save_to(checkpoint)
        try:
            save_checkpoint(filename, checkpoint)
        finally:
            # ALWAYS reach the barrier the non-primary processes wait on
            # (a failed write would otherwise deadlock them with no
            # error surfaced), then let the exception propagate
            dist.barrier(f"save:{os.path.basename(filename)}")

    def _load(self, checkpoint: Dict[str, Any]):
        if checkpoint["type"] != "train":
            raise ValueError("training can only be continued from trained models")

        def reshard(old, new):
            # resume must re-apply the sharding __init__ set up — a plain
            # jnp.asarray would silently replace vocab-sharded tables
            # with replicated copies (OOM at scale, and non-global arrays
            # break multi-host jit)
            arr = np.asarray(new)
            if (self.mesh is not None and hasattr(old, "sharding")
                    and len(old.sharding.device_set) > 1):
                from kge_tpu.parallel.distributed import put_global

                return put_global(arr, old.sharding)
            # single-device shardings (jit(init) emits them for small
            # leaves under multi-process) stay plain asarray: pinning
            # them committed would make the train step reject the mix
            return jnp.asarray(arr)

        with jax.default_device(self.device):
            # checkpoints hold whole tables; re-chunk to this job's live
            # representation before the structural tree_map
            self.params = jax.tree_util.tree_map(
                reshard, self.params,
                self._chunk_params_tree(checkpoint["model"]["params"]),
            )
            state_np = checkpoint["model"].get("state", {})
            if (jax.tree_util.tree_structure(self.model_state)
                    == jax.tree_util.tree_structure(state_np)):
                self.model_state = jax.tree_util.tree_map(
                    reshard, self.model_state, state_np
                )
            else:  # structure changed across versions: best effort
                self.model_state = jax.tree_util.tree_map(
                    jnp.asarray, state_np
                )
            if checkpoint.get("opt_state") is not None and not self.is_forward_only:
                old_leaves = jax.tree_util.tree_leaves(self.opt_state)
                new_leaves = jax.tree_util.tree_leaves(
                    self._chunk_opt_state(checkpoint["opt_state"])
                )
                if len(old_leaves) != len(new_leaves):
                    raise ValueError(
                        "optimizer state in checkpoint has "
                        f"{len(new_leaves)} leaves, expected "
                        f"{len(old_leaves)} (optimizer config changed?)"
                    )
                self.opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.opt_state),
                    [reshard(o, n)
                     for o, n in zip(old_leaves, new_leaves)],
                )
        self.epoch = checkpoint["epoch"]
        self.valid_trace = checkpoint["valid_trace"]
        if "lr_scheduler" in checkpoint:
            self.lr_scheduler.load_state_dict(checkpoint["lr_scheduler"])
        if "rng" in checkpoint:
            self.rng = jnp.asarray(checkpoint["rng"])
        self.resumed_from_job_id = checkpoint.get("job_id")
        self.trace(
            event="job_resumed", epoch=self.epoch,
            checkpoint_file=checkpoint.get("file"),
        )

    def _put_batch(self, batch_np: Dict[str, np.ndarray],
                   stacked: bool = False):
        """Move a host batch to the device(s). Under a mesh, arrays with
        a batch axis shard over "data"; the rest replicate. For grouped
        dispatch (``stacked``) the batch axis sits at position 1 behind
        the k-steps stack axis, which stays unsharded."""
        if self.mesh is None:
            return {
                k: jax.device_put(v, self.device)
                for k, v in batch_np.items()
            }
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kge_tpu.parallel.distributed import put_global

        axis = 1 if stacked else 0
        out = {}
        for k, v in batch_np.items():
            arr = np.asarray(v)
            if arr.ndim > axis and arr.shape[axis] == self.batch_size:
                spec = P(*([None] * axis), "data",
                         *([None] * (arr.ndim - axis - 1)))
            else:
                spec = P()
            out[k] = put_global(arr, NamedSharding(self.mesh, spec))
        return out

    # ------------------------------------------------------------------ batching helpers

    def _pad_batch_indexes(self, order: np.ndarray):
        """Yield (indexes[batch_size], weights[batch_size], true_size)."""
        n = len(order)
        for start in range(0, n, self.batch_size):
            chunk = order[start : start + self.batch_size]
            true = len(chunk)
            if true < self.batch_size:
                pad = np.zeros(self.batch_size - true, dtype=chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            weights = np.zeros(self.batch_size, dtype=np.float32)
            weights[:true] = 1.0
            yield chunk, weights, true
