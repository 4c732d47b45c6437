"""Projection embedder: linear map over a base embedder, plus the
Tucker3 relation embedder that expands relation vectors to entity_dim^2
mixing matrices (reference: kge/model/embedder/projection_embedder.py,
tucker3_relation_embedder.py)."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeEmbedder


class ProjectionEmbedder(KgeEmbedder):
    def __init__(self, config, dataset, configuration_key, vocab_size,
                 init_for_load_only=False):
        super().__init__(
            config, dataset, configuration_key, vocab_size, init_for_load_only
        )
        if not config.exists(self.configuration_key + ".base_embedder.type"):
            config.set(
                self.configuration_key + ".base_embedder.type",
                self.get_option("base_embedder.type"),
                create=True,
            )
        self.base_embedder = KgeEmbedder.create(
            config, dataset, self.configuration_key + ".base_embedder", vocab_size,
            init_for_load_only,
        )
        if self.dim < 0:
            self.dim = self.base_embedder.dim
        self.dropout_rate = self.get_option("dropout")
        self.regularize = self.check_option("regularize", ["", "lp"])

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        r_base, r_proj = jax.random.split(rng)
        return {
            "base": self.base_embedder.init_params(r_base),
            # [out, in], applied as x @ W.T (torch Linear layout)
            "projection": self.initialize(r_proj, (self.dim, self.base_embedder.dim)),
        }

    def _project(self, params, emb: jnp.ndarray, ctx: Ctx) -> jnp.ndarray:
        out = emb @ params["projection"].T
        return ctx.dropout(out, self.dropout_rate)

    def embed(self, params, indexes, ctx: Ctx) -> jnp.ndarray:
        return self._project(params, self.base_embedder.embed(params["base"], indexes, ctx), ctx)

    def embed_all(self, params, ctx: Ctx) -> jnp.ndarray:
        return self._project(params, self.base_embedder.embed_all(params["base"], ctx), ctx)

    def normalize_params(self, params):
        return {**params, "base": self.base_embedder.normalize_params(params["base"])}

    def penalties(self, params, ctx: Ctx, **kwargs) -> List[Tuple[str, jnp.ndarray]]:
        result: List[Tuple[str, jnp.ndarray]] = []
        if self.regularize == "lp" and self.get_option("regularize_weight") != 0.0:
            p = self.get_option("regularize_args.p")
            weight = self.get_option("regularize_weight")
            norm = jnp.sum(jnp.abs(params["projection"]) ** p) ** (1.0 / p)
            result.append((f"{self.configuration_key}.L{p}_penalty", weight * norm))
        return result + self.base_embedder.penalties(params["base"], ctx, **kwargs)


def rescal_set_relation_embedder_dim(config, dataset, rel_emb_conf_key: str):
    """If the relation embedder dim is <0, set it to entity_dim^2
    (reference: kge/model/rescal.py:78-95)."""
    dim = config.get_default(rel_emb_conf_key + ".dim")
    if dim < 0:
        ent_key = rel_emb_conf_key.replace("relation_embedder", "entity_embedder")
        if ent_key == rel_emb_conf_key:
            raise ValueError("cannot determine relation embedding size")
        dim = config.get_default(ent_key + ".dim") ** 2
        config.set(rel_emb_conf_key + ".dim", dim, create=True, log=True)


class Tucker3RelationEmbedder(ProjectionEmbedder):
    """ProjectionEmbedder producing entity_dim^2 relation mixing matrices."""

    def __init__(self, config, dataset, configuration_key, vocab_size,
                 init_for_load_only=False):
        rescal_set_relation_embedder_dim(config, dataset, configuration_key)
        super().__init__(
            config, dataset, configuration_key, vocab_size, init_for_load_only
        )
        # schema-compat key the reference declares but never reads
        # (kge/model/embedder/tucker3_relation_embedder.yaml vs .py)
        normalize = self.get_option("normalize")
        if normalize:
            config.log(
                f"WARNING: {configuration_key}.normalize={normalize!r} has "
                "no effect (the reference ignores this key as well)"
            )
