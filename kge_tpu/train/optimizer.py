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


class KgeOptimizer:
    """Regex parameter groups over a params pytree.

    Group resolution follows the reference: named groups declared under
    ``train.optimizer.<name>`` claim parameters whose dotted path matches
    their regex (overlaps are an error); everything else falls into the
    ``default`` group.
    """

    def __init__(self, config: Config, params_example):
        self.config = config
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
        labels_flat = []
        for path in paths:
            matched = [name for name, rx, _ in group_specs if rx.search(path)]
            if len(matched) > 1:
                raise ValueError(
                    f"parameter {path} matched by multiple optimizer groups: "
                    f"{matched}"
                )
            labels_flat.append(matched[0] if matched else "default")
        treedef = jax.tree_util.tree_structure(params_example)
        self._labels = jax.tree_util.tree_unflatten(treedef, labels_flat)

        # per-group transforms + base learning rates
        transforms: Dict[str, optax.GradientTransformation] = {}
        self.base_lrs: Dict[str, float] = {}
        for name, _, args in group_specs:
            merged = {**default_args, **args}
            transforms[name] = _make_preconditioner(opt_type, merged)
            self.base_lrs[name] = float(merged.get("lr", default_args.get("lr", 1.0)))
            self.group_names.append(name)
        transforms["default"] = _make_preconditioner(opt_type, dict(default_args))
        self.base_lrs["default"] = float(default_args.get("lr", 1.0))
        self.group_names.append("default")
        config.log(
            "optimizer groups: "
            + ", ".join(f"{g} (lr={self.base_lrs[g]})" for g in self.group_names)
        )
        self.tx = optax.multi_transform(transforms, self._labels)

    def init(self, params):
        return self.tx.init(params)

    def apply_updates(self, params, grads, opt_state, lrs: Dict[str, jnp.ndarray]):
        """One optimizer step inside jit; lrs are traced per-group scalars."""
        updates, new_opt_state = self.tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u, label: p - lrs[label] * u,
            params, updates, self._labels,
        )
        return new_params, new_opt_state


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
