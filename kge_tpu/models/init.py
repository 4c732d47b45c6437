"""Parameter initializers, config-dispatched by torch-style names.

The reference dispatches config-named initializers onto ``torch.nn.init``
(reference: kge/model/kge_model.py:41-80); here the same names map onto
jax.random primitives so configs carry over unchanged.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) < 2:
        return (shape[0] if shape else 1,) * 2
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def _calculate_gain(nonlinearity: str, a: float) -> float:
    """torch.nn.init.calculate_gain for the names kaiming accepts;
    `a` (negative slope) only matters for leaky_relu."""
    if nonlinearity in (
        "linear", "identity", "sigmoid", "conv1d", "conv2d", "conv3d",
        "conv_transpose1d", "conv_transpose2d", "conv_transpose3d",
    ):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3.0
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + a * a))
    if nonlinearity == "selu":
        return 3.0 / 4.0
    raise ValueError(f"unsupported nonlinearity {nonlinearity!r}")


def initialize(rng: jax.Array, shape, name: str, args: Dict) -> jnp.ndarray:
    """Draw an initial tensor of ``shape`` using the named scheme."""
    args = dict(args or {})
    args.pop("+++", None)
    if name in ("normal_", "normal"):
        mean = float(args.get("mean", 0.0))
        std = float(args.get("std", 1.0))
        return mean + std * jax.random.normal(rng, shape, dtype=jnp.float32)
    if name in ("uniform_", "uniform"):
        b = float(args.get("b", 1.0))
        # reference quirk (kge/model/kge_model.py:77-79): a missing lower
        # bound defaults to -b (symmetric), not torch's 0
        a = float(args["a"]) if "a" in args else -b
        return jax.random.uniform(rng, shape, minval=a, maxval=b, dtype=jnp.float32)
    if name in ("xavier_normal_", "xavier_normal"):
        gain = float(args.get("gain", 1.0))
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(rng, shape, dtype=jnp.float32)
    if name in ("xavier_uniform_", "xavier_uniform"):
        gain = float(args.get("gain", 1.0))
        fan_in, fan_out = _fans(shape)
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(rng, shape, minval=-a, maxval=a, dtype=jnp.float32)
    if name in ("kaiming_uniform_", "kaiming_uniform"):
        fan_in, fan_out = _fans(shape)
        fan = fan_out if args.get("mode", "fan_in") == "fan_out" else fan_in
        gain = _calculate_gain(
            args.get("nonlinearity", "leaky_relu"), float(args.get("a", 0.0))
        )
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(
            rng, shape, minval=-bound, maxval=bound, dtype=jnp.float32
        )
    if name in ("kaiming_normal_", "kaiming_normal"):
        fan_in, fan_out = _fans(shape)
        fan = fan_out if args.get("mode", "fan_in") == "fan_out" else fan_in
        gain = _calculate_gain(
            args.get("nonlinearity", "leaky_relu"), float(args.get("a", 0.0))
        )
        std = gain / math.sqrt(fan)
        return std * jax.random.normal(rng, shape, dtype=jnp.float32)
    if name in ("trunc_normal_", "trunc_normal"):
        mean = float(args.get("mean", 0.0))
        std = float(args.get("std", 1.0))
        a = float(args.get("a", -2.0))
        b = float(args.get("b", 2.0))
        lo, hi = (a - mean) / std, (b - mean) / std
        return mean + std * jax.random.truncated_normal(
            rng, lo, hi, shape, dtype=jnp.float32
        )
    if name in ("orthogonal_", "orthogonal"):
        gain = float(args.get("gain", 1.0))
        return gain * jax.nn.initializers.orthogonal()(
            rng, shape, jnp.float32
        )
    if name in ("constant_", "constant"):
        return jnp.full(shape, float(args.get("val", 0.0)), dtype=jnp.float32)
    if name in ("ones_", "ones"):
        return jnp.ones(shape, dtype=jnp.float32)
    if name in ("zeros_", "zeros"):
        return jnp.zeros(shape, dtype=jnp.float32)
    raise ValueError(f"unknown initializer {name!r}")


def select_initialize_args(name: str, args: Dict) -> Dict:
    """If args has a subkey matching the initializer name, use that subtree
    (reference behavior for lookup_embedder.initialize_args)."""
    args = dict(args or {})
    args.pop("+++", None)
    if name in args and isinstance(args[name], dict):
        return args[name]
    if name.rstrip("_") in args and isinstance(args[name.rstrip("_")], dict):
        return args[name.rstrip("_")]
    # drop any other initializer-named subtrees
    return {k: v for k, v in args.items() if not isinstance(v, dict)}
