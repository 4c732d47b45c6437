"""Transformer ("no context" HittER) scorer.

Functional re-design of the reference (kge/model/transformer.py): a
3-token sequence [CLS, s+type_s, p+type_p] runs through a post-norm
transformer encoder; the transformed CLS embedding is dotted with object
embeddings. All weights live in the scorer params pytree; attention is
expressed with einsums that XLA fuses onto the MXU. Must be used with
ReciprocalRelationsModel (sp_/spo only).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeModel, RelationalScorer
from kge_tpu.models.init import initialize


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


class TransformerScorer(RelationalScorer):
    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self.emb_dim = self.get_option("entity_embedder.dim")
        self.nhead = self.get_option("encoder.nhead")
        self.ff_dim = self.get_option("encoder.dim_feedforward")
        self.num_layers = self.get_option("encoder.num_layers")
        self.activation = self.check_option("encoder.activation", ["relu", "gelu"])
        self.dropout_rate = self.get_option("encoder.dropout")
        if self.dropout_rate < 0.0:
            if config.get("train.auto_correct"):
                config.log(
                    f"Setting {configuration_key}.encoder.dropout to 0 "
                    f"(was {self.dropout_rate})."
                )
                self.dropout_rate = 0.0
        if self.emb_dim % self.nhead != 0:
            raise ValueError("entity_embedder.dim must be divisible by nhead")

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        d, ff = self.emb_dim, self.ff_dim
        keys = jax.random.split(rng, 3 + self.num_layers)

        def init_w(k, shape):
            return self.initialize(k, shape)

        layers = []
        for i in range(self.num_layers):
            ks = jax.random.split(keys[3 + i], 4)
            layers.append({
                "qkv_w": init_w(ks[0], (3 * d, d)),
                "qkv_b": jnp.zeros(3 * d),
                "out_w": init_w(ks[1], (d, d)),
                "out_b": jnp.zeros(d),
                "lin1_w": init_w(ks[2], (ff, d)),
                "lin1_b": jnp.zeros(ff),
                "lin2_w": init_w(ks[3], (d, ff)),
                "lin2_b": jnp.zeros(d),
                "ln1_scale": jnp.ones(d), "ln1_bias": jnp.zeros(d),
                "ln2_scale": jnp.ones(d), "ln2_bias": jnp.zeros(d),
            })
        return {
            "cls": self.initialize(keys[0], (d,)),
            "sub_type": self.initialize(keys[1], (d,)),
            "rel_type": self.initialize(keys[2], (d,)),
            "layers": layers,
        }

    def _encoder(self, params, x: jnp.ndarray, ctx: Ctx) -> jnp.ndarray:
        """Post-norm transformer encoder over x: [batch, seq, d]."""
        d = self.emb_dim
        h = self.nhead
        dk = d // h
        act = jax.nn.relu if self.activation == "relu" else jax.nn.gelu
        for layer in params["layers"]:
            qkv = x @ layer["qkv_w"].T + layer["qkv_b"]            # [b, s, 3d]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            def heads(t):  # [b, s, d] -> [b, h, s, dk]
                return t.reshape(t.shape[0], t.shape[1], h, dk).transpose(0, 2, 1, 3)
            q, k, v = heads(q), heads(k), heads(v)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dk)
            attn = jax.nn.softmax(logits, axis=-1)
            attn = ctx.dropout(attn, self.dropout_rate)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(x.shape)
            out = out @ layer["out_w"].T + layer["out_b"]
            x = _layer_norm(
                x + ctx.dropout(out, self.dropout_rate),
                layer["ln1_scale"], layer["ln1_bias"],
            )
            ff = act(x @ layer["lin1_w"].T + layer["lin1_b"])
            ff = ctx.dropout(ff, self.dropout_rate)
            ff = ff @ layer["lin2_w"].T + layer["lin2_b"]
            x = _layer_norm(
                x + ctx.dropout(ff, self.dropout_rate),
                layer["ln2_scale"], layer["ln2_bias"],
            )
        return x

    # dot form: score = encoded-CLS . e_o with raw candidates; like
    # ConvE this is sp_-only, which reciprocal wrapping (the standard
    # eval configuration) uses for both ranking sides.
    supports_dot_form = True
    dot_combines = ("sp_",)

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        if combine != "sp_":
            raise ValueError(
                "Transformer has no _po dot form (wrap in "
                "reciprocal_relations_model, which queries sp_ both ways)"
            )
        x = jnp.stack(
            [
                jnp.broadcast_to(params["cls"][None, :], a_emb.shape),
                a_emb + params["sub_type"][None, :],
                p_emb + params["rel_type"][None, :],
            ],
            axis=1,
        )
        return self._encoder(params, x, ctx)[:, 0, :]

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return cand_emb

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        if combine not in ("sp_", "spo"):
            raise ValueError(f"combine {combine} not supported by Transformer")
        batch_size = s_emb.shape[0]
        x = jnp.stack(
            [
                jnp.broadcast_to(params["cls"][None, :], s_emb.shape),
                s_emb + params["sub_type"][None, :],
                p_emb + params["rel_type"][None, :],
            ],
            axis=1,
        )  # [batch, 3, d]
        out = self._encoder(params, x, ctx)[:, 0, :]  # transformed CLS
        if combine == "sp_":
            out = out @ o_emb.T
        else:
            out = jnp.sum(out * o_emb, axis=-1)
        return out.reshape(batch_size, -1)


class Transformer(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        super().__init__(
            config, dataset,
            TransformerScorer(config, dataset, self.configuration_key),
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )

    def score_spo(self, params, s, p, o, direction=None, ctx=None):
        if direction == "o":
            return super().score_spo(params, s, p, o, direction, ctx)
        raise ValueError("Transformer can only score objects")
