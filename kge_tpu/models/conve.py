"""ConvE: 2D convolution over stacked (s, p) reshapes + projection.

Functional re-design of the reference scorer (kge/model/conve.py): conv
and projection weights live in the scorer params pytree; the affine-free
batch-norm running statistics live in the model *state* collection and
are threaded through Ctx (train mode uses batch statistics and emits
updated running stats into ``ctx.updates``). Convolution maps onto
``lax.conv_general_dilated`` (XLA lowers it onto the MXU).

Embedding dimension 0 is the per-entity bias term, as in the reference
("HACK to add bias terms", conve.py:110-135): the model requests
entity/relation dim+1 from the embedders and scores with dims 1..d.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeModel, RelationalScorer
from kge_tpu.models.init import initialize


def batch_norm(x: jnp.ndarray, name: str, ctx: Ctx, reduce_axes,
               momentum: float = 0.1, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free batch norm with torch running-stat semantics."""
    state = ctx.state[name]
    if ctx.train:
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.var(x, axis=reduce_axes)  # biased, used for normalization
        n = 1
        for ax in reduce_axes:
            n *= x.shape[ax]
        unbiased = var * n / max(n - 1, 1)
        ctx.updates[name] = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
    shape = [1] * x.ndim
    keep_axes = [i for i in range(x.ndim) if i not in reduce_axes]
    for ax in keep_axes:
        shape[ax] = x.shape[ax]
    return (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)


class ConvEScorer(RelationalScorer):
    """Must be wrapped in ReciprocalRelationsModel (sp_/spo only)."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self.emb_dim = self.get_option("entity_embedder.dim") - 1
        aspect_ratio = self.get_option("2D_aspect_ratio")
        self.emb_height = math.sqrt(self.emb_dim / aspect_ratio)
        self.emb_width = self.emb_height * aspect_ratio
        rounded_height = math.ceil(self.emb_height)
        if self.get_option("round_dim") and rounded_height != self.emb_height:
            self.emb_height = rounded_height
            self.emb_width = self.emb_height * aspect_ratio
            self.emb_dim = self.emb_height * self.emb_width
            self.set_option("entity_embedder.dim", self.emb_dim + 1, log=True)
            self.set_option("relation_embedder.dim", self.emb_dim + 1, log=True)
            config.log(f"Rounded embedding dimension to {self.emb_dim}")
        elif self.emb_dim % self.emb_height or self.emb_dim % self.emb_width:
            raise ValueError(
                f"embedding dim {self.emb_dim} incompatible with aspect ratio "
                f"{aspect_ratio}; set conve.round_dim=true"
            )
        self.emb_height = int(self.emb_height)
        self.emb_width = int(self.emb_width)
        self.emb_dim = int(self.emb_dim)
        self.filter_size = self.get_option("filter_size")
        self.stride = self.get_option("stride")
        self.padding = self.get_option("padding")
        self.feature_map_dropout = self.get_option("feature_map_dropout")
        self.projection_dropout = self.get_option("projection_dropout")
        self.convolution_bias = self.get_option("convolution_bias")
        self.out_channels = 32
        self.conv_h = (
            (self.emb_height * 2 - self.filter_size + 2 * self.padding)
            // self.stride + 1
        )
        self.conv_w = (
            (self.emb_width - self.filter_size + 2 * self.padding)
            // self.stride + 1
        )
        self.flat = self.out_channels * self.conv_h * self.conv_w

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        fan_in_conv = self.filter_size * self.filter_size
        params = {
            # OIHW conv kernel; a=sqrt(5) is torch's Conv2d/Linear
            # reset_parameters value (NOT the kaiming_uniform_ default)
            "conv_w": initialize(
                k1, (self.out_channels, 1, self.filter_size, self.filter_size),
                "kaiming_uniform_", {"a": math.sqrt(5.0)},
            ),
            "proj_w": initialize(
                k2, (self.emb_dim, self.flat), "kaiming_uniform_",
                {"a": math.sqrt(5.0)},
            ),
            "proj_b": initialize(
                k3, (self.emb_dim,), "uniform_",
                {"a": -1.0 / math.sqrt(self.flat), "b": 1.0 / math.sqrt(self.flat)},
            ),
        }
        if self.convolution_bias:
            bound = 1.0 / math.sqrt(fan_in_conv)
            params["conv_b"] = initialize(
                k4, (self.out_channels,), "uniform_", {"a": -bound, "b": bound}
            )
        return params

    def init_state(self) -> Dict[str, Any]:
        return {
            "bn1": {
                "mean": jnp.zeros(self.out_channels),
                "var": jnp.ones(self.out_channels),
            },
            "bn2": {
                "mean": jnp.zeros(self.emb_dim),
                "var": jnp.ones(self.emb_dim),
            },
        }

    def _features(self, params, s_emb, p_emb, ctx: Ctx) -> jnp.ndarray:
        batch_size = p_emb.shape[0]
        s_2d = s_emb[:, 1:].reshape(-1, 1, self.emb_height, self.emb_width)
        p_2d = p_emb[:, 1:].reshape(-1, 1, self.emb_height, self.emb_width)
        stacked = jnp.concatenate([s_2d, p_2d], axis=2)
        out = jax.lax.conv_general_dilated(
            stacked, params["conv_w"],
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.convolution_bias:
            out = out + params["conv_b"][None, :, None, None]
        out = batch_norm(out, "bn1", ctx, reduce_axes=(0, 2, 3))
        out = jax.nn.relu(out)
        out = ctx.dropout(out, self.feature_map_dropout)
        out = out.reshape(batch_size, -1)
        out = out @ params["proj_w"].T + params["proj_b"]
        out = ctx.dropout(out, self.projection_dropout)
        out = batch_norm(out, "bn2", ctx, reduce_axes=(0,))
        return jax.nn.relu(out)

    # dot form: score = [1 || features(s,p)] . [bias || e_o] — the raw
    # candidate row IS the candidate vector (bias lives in dim 0), so
    # reciprocal-wrapped ConvE (its only usable eval configuration —
    # both ranking sides rewrite to sp_) rides the fused rank-count
    # kernel streaming the embedding table directly.
    supports_dot_form = True
    dot_combines = ("sp_",)

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        if combine != "sp_":
            raise ValueError(
                "ConvE has no _po dot form (wrap in "
                "reciprocal_relations_model, which queries sp_ both ways)"
            )
        feats = self._features(params, a_emb, p_emb, ctx)
        return jnp.concatenate(
            [jnp.ones_like(feats[:, :1]), feats], axis=1
        )

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return cand_emb

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        if combine not in ("sp_", "spo"):
            raise ValueError(f"combine {combine} not supported by ConvE")
        batch_size = p_emb.shape[0]
        out = self._features(params, s_emb, p_emb, ctx)
        if combine == "sp_":
            out = out @ o_emb[:, 1:].T
        else:
            out = jnp.sum(out * o_emb[:, 1:], axis=-1)
        out = out + o_emb[:, 0]
        return out.reshape(batch_size, -1)


class ConvE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        # embedding dim 0 is the entity bias term
        self.set_option(
            "entity_embedder.dim", self.get_option("entity_embedder.dim") + 1,
            create=True,
        )
        self.set_option(
            "relation_embedder.dim", self.get_option("relation_embedder.dim") + 1,
            create=True,
        )
        super().__init__(
            config, dataset,
            ConvEScorer(config, dataset, self.configuration_key),
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
        self.set_option(
            "entity_embedder.dim", self.get_option("entity_embedder.dim") - 1
        )
        self.set_option(
            "relation_embedder.dim", self.get_option("relation_embedder.dim") - 1
        )

    def score_spo(self, params, s, p, o, direction=None, ctx=None):
        if direction == "o":
            return super().score_spo(params, s, p, o, direction, ctx)
        raise ValueError("ConvE can only score objects")
