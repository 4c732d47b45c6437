"""Optimizers and LR scheduling over params pytrees.

Design: the optimizer is split into (a) a compiled optax preconditioner
per regex-defined parameter group (reference groups:
kge/util/optimizer.py:9-96) and (b) host-side learning-rate control.
Group learning rates enter the compiled train step as *traced scalars*,
so warmup/plateau scheduling never triggers recompilation.

Update rule per leaf: ``param += -lr[group(leaf)] * precond_update``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kge_tpu.config import Config


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def _torch_adagrad(initial_accumulator_value: float = 0.0,
                   eps: float = 1e-10) -> optax.GradientTransformation:
    """Adagrad preconditioner with torch semantics:
    state += g^2; update = g / (sqrt(state) + eps)."""

    def init_fn(params):
        return {
            "sum": jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params
            )
        }

    def update_fn(updates, state, params=None):
        new_sum = jax.tree_util.tree_map(
            lambda s, g: s + g * g, state["sum"], updates
        )
        out = jax.tree_util.tree_map(
            lambda g, s: g / (jnp.sqrt(s) + eps), updates, new_sum
        )
        return out, {"sum": new_sum}

    return optax.GradientTransformation(init_fn, update_fn)


def _make_preconditioner(opt_type: str, args: Dict[str, Any]
                         ) -> optax.GradientTransformation:
    """Build the lr-free part of the named optimizer."""
    args = {k: v for k, v in args.items() if k not in ("lr", "+++")}
    name = opt_type.lower()
    weight_decay = args.pop("weight_decay", 0.0)
    chain: List[optax.GradientTransformation] = []
    if weight_decay and name != "adamw":
        chain.append(optax.add_decayed_weights(weight_decay))
    if name == "adagrad":
        chain.append(
            _torch_adagrad(
                initial_accumulator_value=args.pop("initial_accumulator_value", 0.0),
                eps=args.pop("eps", 1e-10),
            )
        )
    elif name in ("adam", "adamw"):
        betas = args.pop("betas", (0.9, 0.999))
        chain.append(
            optax.scale_by_adam(
                b1=betas[0], b2=betas[1], eps=args.pop("eps", 1e-8)
            )
        )
        if name == "adamw":
            chain.append(optax.add_decayed_weights(weight_decay or 1e-2))
    elif name == "adamax":
        betas = args.pop("betas", (0.9, 0.999))
        chain.append(
            optax.scale_by_adamax(
                b1=betas[0], b2=betas[1], eps=args.pop("eps", 1e-8)
            )
        )
    elif name == "sgd":
        momentum = args.pop("momentum", 0.0)
        nesterov = args.pop("nesterov", False)
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        else:
            chain.append(optax.identity())
    elif name == "rmsprop":
        chain.append(
            optax.scale_by_rms(
                decay=args.pop("alpha", 0.99), eps=args.pop("eps", 1e-8)
            )
        )
    elif name == "adadelta":
        chain.append(
            optax.scale_by_adadelta(
                rho=args.pop("rho", 0.9), eps=args.pop("eps", 1e-6)
            )
        )
    else:
        raise ValueError(f"unsupported optimizer type {opt_type}")
    return optax.chain(*chain)


def sparse_unsupported_reason(config: Config) -> Optional[str]:
    """Why row-sparse updates cannot replicate this optimizer exactly
    (None when they can). Torch draws the same line: sparse gradients
    work with Adagrad/plain SGD only (reference: lookup_embedder.yaml
    ``sparse`` + torch.optim sparse support)."""
    opt_type = config.get("train.optimizer.default.type").lower()
    if opt_type not in ("adagrad", "sgd"):
        return f"optimizer type {opt_type} has dense per-row state semantics"
    args_list = [dict(config.get("train.optimizer.default.args") or {})]
    for name in config.get("train.optimizer").keys():
        if name == "default":
            continue
        args_list.append(dict(config.get(f"train.optimizer.{name}.args") or {}))
    for args in args_list:
        if args.get("weight_decay", 0.0):
            return "weight_decay touches every row each step"
        if opt_type == "sgd" and args.get("momentum", 0.0):
            return "SGD momentum decays untouched rows each step"
    return None


def _get_by_path(tree, path: str):
    node = tree
    for part in path.split("."):
        node = node[int(part) if part.isdigit() else part]
    return node


def _set_by_path(tree, path: str, value):
    parts = path.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[int(part) if part.isdigit() else part]
    node[parts[-1]] = value


class KgeOptimizer:
    """Regex parameter groups over a params pytree.

    Group resolution follows the reference: named groups declared under
    ``train.optimizer.<name>`` claim parameters whose dotted path matches
    their regex (overlaps are an error); everything else falls into the
    ``default`` group.

    Leaves named in ``sparse_paths`` (embedding tables) are excluded from
    the dense optax transform; the training job updates their touched
    rows via ``sparse_row_update`` (the TPU counterpart of torch sparse
    Adagrad). Their per-row state lives under ``opt_state["sparse"]``.
    """

    def __init__(self, config: Config, params_example, sparse_paths=()):
        self.config = config
        self.sparse_paths: Tuple[str, ...] = tuple(sparse_paths)
        if self.sparse_paths:
            reason = sparse_unsupported_reason(config)
            if reason is not None:
                raise ValueError(f"sparse updates unsupported: {reason}")
        self.group_names: List[str] = []
        group_specs: List[Tuple[str, Optional[re.Pattern], Dict]] = []
        for name in config.get("train.optimizer").keys():
            if name == "default":
                continue
            regex = config.get(f"train.optimizer.{name}.regex")
            args = dict(config.get(f"train.optimizer.{name}.args") or {})
            group_specs.append((name, re.compile(regex), args))
        default_args = dict(config.get("train.optimizer.default.args") or {})
        opt_type = config.get("train.optimizer.default.type")

        # label each leaf with its group
        paths = [
            _path_str(path)
            for path, _ in jax.tree_util.tree_flatten_with_path(params_example)[0]
        ]
        def is_sparse(path: str) -> bool:
            # row-chunked tables are TUPLES of chunks (train/chunking.py)
            # whose leaves flatten to "<table path>.<chunk index>"
            return path in self.sparse_paths or any(
                path.startswith(sp + ".") for sp in self.sparse_paths
            )

        def group_of(path: str) -> str:
            matched = [name for name, rx, _ in group_specs if rx.search(path)]
            if len(matched) > 1:
                raise ValueError(
                    f"parameter {path} matched by multiple optimizer groups: "
                    f"{matched}"
                )
            return matched[0] if matched else "default"

        labels_flat = []      # transform labels ("__sparse__" leaves opt out)
        lr_labels_flat = []   # group labels for learning rates
        for path in paths:
            group = group_of(path)
            lr_labels_flat.append(group)
            labels_flat.append("__sparse__" if is_sparse(path) else group)
        treedef = jax.tree_util.tree_structure(params_example)
        self._labels = jax.tree_util.tree_unflatten(treedef, labels_flat)
        self._lr_labels = jax.tree_util.tree_unflatten(treedef, lr_labels_flat)
        self._lr_label_by_path = dict(zip(paths, lr_labels_flat))
        for sp in self.sparse_paths:
            # chunked tables have no flattened leaf at the base path;
            # sparse_row_update still keys its lr group on it
            self._lr_label_by_path.setdefault(sp, group_of(sp))

        # per-group transforms + base learning rates
        transforms: Dict[str, optax.GradientTransformation] = {}
        self.base_lrs: Dict[str, float] = {}
        self._opt_type = opt_type.lower()
        self._group_args: Dict[str, Dict[str, Any]] = {}
        for name, _, args in group_specs:
            merged = {**default_args, **args}
            transforms[name] = _make_preconditioner(opt_type, merged)
            self.base_lrs[name] = float(merged.get("lr", default_args.get("lr", 1.0)))
            self.group_names.append(name)
            self._group_args[name] = merged
        transforms["default"] = _make_preconditioner(opt_type, dict(default_args))
        self.base_lrs["default"] = float(default_args.get("lr", 1.0))
        self.group_names.append("default")
        self._group_args["default"] = dict(default_args)
        if self.sparse_paths:
            transforms["__sparse__"] = optax.set_to_zero()
        config.log(
            "optimizer groups: "
            + ", ".join(f"{g} (lr={self.base_lrs[g]})" for g in self.group_names)
        )
        self.tx = optax.multi_transform(transforms, self._labels)

    def init(self, params):
        tx_state = self.tx.init(params)
        if not self.sparse_paths:
            return tx_state
        sparse: Dict[str, Any] = {}
        for path in self.sparse_paths:
            leaf = _get_by_path(params, path)
            if self._opt_type == "adagrad":
                initial = float(
                    self._group_args[self._lr_label_by_path[path]].get(
                        "initial_accumulator_value", 0.0
                    )
                )
                # leaf is one [V, D] array or (chunked tables) a tuple
                # of chunks; the accumulator mirrors its structure
                sparse[path] = {
                    "sum": jax.tree_util.tree_map(
                        lambda a: jnp.full_like(a, initial), leaf
                    )
                }
            else:  # plain sgd: stateless
                sparse[path] = {}
        return {"tx": tx_state, "sparse": sparse}

    def apply_updates(self, params, grads, opt_state, lrs: Dict[str, jnp.ndarray]):
        """One optimizer step inside jit; lrs are traced per-group scalars.
        Sparse-path leaves pass through unchanged (the job row-updates
        them via ``sparse_row_update``)."""
        tx_state = opt_state["tx"] if self.sparse_paths else opt_state
        updates, new_tx_state = self.tx.update(grads, tx_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u, label, lr_label:
                p if label == "__sparse__" else p - lrs[lr_label] * u,
            params, updates, self._labels, self._lr_labels,
        )
        if self.sparse_paths:
            return new_params, {"tx": new_tx_state,
                                "sparse": opt_state["sparse"]}
        return new_params, new_tx_state

    def sparse_row_update(self, path: str, table, sparse_state, uniq,
                          row_grads, lrs: Dict[str, jnp.ndarray],
                          in_place: bool = False):
        """Row-wise optimizer step on the touched rows of one table.

        ``uniq`` is a sorted, padded unique-index vector; duplicate/fill
        entries carry zero gradient, so their contributions vanish (the
        accumulator update is an add of g^2, not a set, to stay correct
        under duplicates). Exact counterpart of torch sparse Adagrad /
        plain SGD on sparse gradients.

        ``in_place=True`` routes through the Pallas row-update kernel
        (ops/pallas/row_update.py) whose aliased buffers are guaranteed
        updated in place — inside the fused train step, XLA's scatter
        form materializes whole-table operand copies (~17 ms/step flat
        at Wikidata5M scale). Callers enable it off-mesh on real TPU
        (pallas_call has no SPMD partitioning rule; per-shard tables
        under a mesh are small enough for the XLA form).
        """
        group = self._lr_label_by_path[path]
        lr = lrs[group]
        args = self._group_args[group]
        if isinstance(table, tuple):
            # row-chunked table (train/chunking.py): per-chunk masked
            # update. ``uniq`` stays global and sorted; each chunk sees
            # local indices (global - chunk offset). Indices past the
            # chunk end are DROPPED by mode="drop", but NEGATIVE indices
            # would WRAP (numpy semantics — drop mode only drops >= size),
            # so they clamp to 0 and their update values are masked to
            # zero instead; the clamped prefix keeps the vector sorted
            # (0...0, then increasing).
            eps = float(args.get("eps", 1e-10))
            rows_c = table[0].shape[0]
            new_chunks, new_sums = [], []
            sums = sparse_state.get("sum")
            for k, chunk in enumerate(table):
                local = uniq - k * rows_c
                idx = jnp.maximum(local, 0)
                mask = (local >= 0).astype(row_grads.dtype)[:, None]
                g = row_grads * mask
                if self._opt_type == "adagrad":
                    sum_rows = jnp.take(
                        sums[k], jnp.clip(local, 0, rows_c - 1), axis=0
                    )
                    new_sum_rows = sum_rows + row_grads * row_grads
                    update = row_grads / (jnp.sqrt(new_sum_rows) + eps)
                    new_sums.append(sums[k].at[idx].add(
                        g * row_grads, indices_are_sorted=True,
                        mode="drop",
                    ))
                else:
                    update = row_grads
                new_chunks.append(chunk.at[idx].add(
                    -lr * update * mask, indices_are_sorted=True,
                    mode="drop",
                ))
            if self._opt_type == "adagrad":
                return tuple(new_chunks), {"sum": tuple(new_sums)}
            return tuple(new_chunks), sparse_state
        if in_place:
            from kge_tpu.ops.pallas.row_update import (
                adagrad_row_update, sgd_row_update
            )

            interpret = jax.default_backend() == "cpu"
            if self._opt_type == "adagrad":
                eps = float(args.get("eps", 1e-10))
                new_table, new_sum = adagrad_row_update(
                    table, sparse_state["sum"], uniq, row_grads, lr, eps,
                    interpret=interpret,
                )
                return new_table, {"sum": new_sum}
            return (
                sgd_row_update(table, uniq, row_grads, lr,
                               interpret=interpret),
                sparse_state,
            )
        # uniq is sorted (jnp.unique output); the sorted-scatter path is
        # faster than the default scatter lowering on large tables
        if self._opt_type == "adagrad":
            eps = float(args.get("eps", 1e-10))
            sum_rows = jnp.take(sparse_state["sum"], uniq, axis=0)
            new_sum_rows = sum_rows + row_grads * row_grads
            update = row_grads / (jnp.sqrt(new_sum_rows) + eps)
            new_state = {
                "sum": sparse_state["sum"].at[uniq].add(
                    row_grads * row_grads, indices_are_sorted=True
                )
            }
            return (
                table.at[uniq].add(-lr * update, indices_are_sorted=True),
                new_state,
            )
        # plain SGD
        return (
            table.at[uniq].add(-lr * row_grads, indices_are_sorted=True),
            sparse_state,
        )

    def sparse_rowset_update(self, path: str, W, A, pos, row_grads,
                             lrs: Dict[str, jnp.ndarray]):
        """Row-wise optimizer step INSIDE a dispatch-level working set:
        ``W``/``A`` hold the parameter and Adagrad-accumulator rows of
        the dispatch's touched-row union; ``pos`` are this batch's
        (distinct, sorted) positions into them. Same math as
        sparse_row_update, but the scatters touch only the small
        [|union|, D] buffers — the whole-table scatter happens once per
        dispatch, not once per step (train_negative_sampling.py
        _build_group_step). Returns (new_W, new_A); A is None for
        stateless SGD."""
        group = self._lr_label_by_path[path]
        lr = lrs[group]
        args = self._group_args[group]
        if self._opt_type == "adagrad":
            eps = float(args.get("eps", 1e-10))
            a_rows = jnp.take(A, pos, axis=0)
            new_a_rows = a_rows + row_grads * row_grads
            update = row_grads / (jnp.sqrt(new_a_rows) + eps)
            A = A.at[pos].add(row_grads * row_grads,
                              indices_are_sorted=True, unique_indices=True)
            W = W.at[pos].add(-lr * update, indices_are_sorted=True,
                              unique_indices=True)
            return W, A
        W = W.at[pos].add(-lr * row_grads, indices_are_sorted=True,
                          unique_indices=True)
        return W, A


class KgeLRScheduler:
    """Host-side LR control: warmup + torch-style schedulers by name
    (reference: kge/util/optimizer.py:98-159 and train.py:199-233).

    ``lr_scale(epoch)`` multiplies every group's base lr; metric-based
    (ReduceLROnPlateau) scaling reacts to validation metrics.
    """

    def __init__(self, config: Config):
        self.config = config
        self.name = config.get("train.lr_scheduler")
        self.args = {
            k: v for k, v in (config.get("train.lr_scheduler_args") or {}).items()
            if k != "+++"
        }
        self.warmup_epochs = config.get("train.lr_warmup")
        self.metric_based = self.name == "ReduceLROnPlateau"
        self._scale = 1.0
        self._steps = 0
        # plateau state
        self._mode_max = config.get("valid.metric_max")
        self._best: Optional[float] = None
        self._bad_count = 0

    def state_dict(self) -> Dict[str, Any]:
        return {
            "scale": self._scale, "steps": self._steps,
            "best": self._best, "bad_count": self._bad_count,
        }

    def load_state_dict(self, state: Dict[str, Any]):
        self._scale = state.get("scale", 1.0)
        self._steps = state.get("steps", 0)
        self._best = state.get("best")
        self._bad_count = state.get("bad_count", 0)

    def step(self, metric: Optional[float] = None):
        """Advance one scheduler step (called once per epoch after valid)."""
        if not self.name:
            return
        self._steps += 1
        if self.metric_based:
            if metric is None:
                return
            factor = float(self.args.get("factor", 0.1))
            patience = int(self.args.get("patience", 10))
            threshold = float(self.args.get("threshold", 1e-4))
            better = False
            if self._best is None:
                better = True
            elif self._mode_max:
                better = metric > self._best * (1 + threshold)
            else:
                better = metric < self._best * (1 - threshold)
            if better:
                self._best = metric
                self._bad_count = 0
            else:
                self._bad_count += 1
                if self._bad_count > patience:
                    self._scale *= factor
                    self._bad_count = 0
                    self.config.log(
                        f"ReduceLROnPlateau: lr scale -> {self._scale}"
                    )
        elif self.name == "StepLR":
            step_size = int(self.args.get("step_size", 30))
            gamma = float(self.args.get("gamma", 0.1))
            self._scale = gamma ** (self._steps // step_size)
        elif self.name == "MultiStepLR":
            milestones = list(self.args.get("milestones", []))
            gamma = float(self.args.get("gamma", 0.1))
            self._scale = gamma ** sum(1 for m in milestones if self._steps >= m)
        elif self.name == "ExponentialLR":
            gamma = float(self.args.get("gamma", 0.95))
            self._scale = gamma ** self._steps
        elif self.name == "CosineAnnealingLR":
            t_max = int(self.args.get("T_max", 100))
            eta_min = float(self.args.get("eta_min", 0.0))
            self._scale = eta_min + (1 - eta_min) * 0.5 * (
                1 + np.cos(np.pi * min(self._steps, t_max) / t_max)
            )
        elif self.name == "ConstantLR":
            factor = float(self.args.get("factor", 1.0 / 3.0))
            total = int(self.args.get("total_iters", 5))
            self._scale = factor if self._steps < total else 1.0
        else:
            raise ValueError(f"unsupported lr scheduler {self.name}")

    def lr_scale(self, epoch: int) -> float:
        """Combined warmup x scheduler multiplier for the given epoch."""
        warmup = 1.0
        if self.warmup_epochs > 0 and epoch <= self.warmup_epochs:
            warmup = epoch / self.warmup_epochs
        return warmup * self._scale
