"""Reciprocal relations wrapper: doubled relation vocabulary.

(?,p,o) queries are rewritten as (o, p+R, ?) so the base model only ever
predicts objects (reference: kge/model/reciprocal_relations_model.py).
The base model is built over a shallow dataset copy with 2R relations.
"""

from __future__ import annotations

import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeModel


class ReciprocalRelationsModel(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        alt_dataset = dataset.shallow_copy()
        alt_dataset._num_relations = dataset.num_relations() * 2
        alt_dataset._meta = dict(dataset._meta)
        if "relation_ids" in dataset._meta or True:
            try:
                rel_ids = list(dataset.relation_ids())
                alt_dataset._meta["relation_ids"] = rel_ids + [
                    f"{r}_reciprocal" for r in rel_ids
                ]
            except Exception:
                pass
        base_model = KgeModel.create(
            config=config,
            dataset=alt_dataset,
            configuration_key=self.configuration_key + ".base_model",
            init_for_load_only=init_for_load_only,
        )
        super().__init__(
            config, dataset, base_model.get_scorer(), create_embedders=False,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
        self._base_model = base_model
        self._entity_embedder = base_model.get_s_embedder()
        self._relation_embedder = base_model.get_p_embedder()

    def init_params(self, rng):
        return self._base_model.init_params(rng)

    def init_state(self):
        return self._base_model.init_state()

    def normalize_params(self, params):
        return self._base_model.normalize_params(params)

    def prepare_job(self, job, **kwargs):
        self._base_model.prepare_job(job, **kwargs)

    def penalties(self, params, ctx: Ctx, batch=None, **kwargs):
        return self._base_model.penalties(params, ctx, batch=batch, **kwargs)

    def score_spo(self, params, s, p, o, direction=None, ctx=None):
        if direction == "o":
            return self._base_model.score_spo(params, s, p, o, "o", ctx)
        if direction == "s":
            return self._base_model.score_spo(
                params, o, p + self.dataset.num_relations(), s, "o", ctx
            )
        raise ValueError(
            "the reciprocal relations model cannot compute undirected spo scores"
        )

    def score_po(self, params, p, o, s_subset=None, ctx=None):
        ctx = ctx or Ctx()
        if s_subset is not None:
            s_emb = self.get_s_embedder().embed(
                params["entity_embedder"], s_subset, ctx
            )
        else:
            s_emb = self.get_s_embedder().embed_all(params["entity_embedder"], ctx)
        p_emb = self.get_p_embedder().embed(
            params["relation_embedder"], p + self.dataset.num_relations(), ctx
        )
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        return self._scorer.score_emb(
            params["scorer"], o_emb, p_emb, s_emb, "sp_", ctx
        )

    def score_so(self, params, s, o, p_subset=None, ctx=None):
        raise ValueError("the reciprocal relations model cannot score relations")

    def supports_dot_ranking(self) -> bool:
        # both ranking sides rewrite to sp_ queries, so an sp_-only dot
        # form (ConvE, Transformer) suffices
        return self._scorer.supports_dot_form and \
            "sp_" in self._scorer.dot_combines

    def dot_queries(self, params, s, p, o, ctx=None):
        ctx = ctx or Ctx()
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        p_inv = self.get_p_embedder().embed(
            params["relation_embedder"], p + self.dataset.num_relations(), ctx
        )
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        q_sp = self._scorer.query_vec(params["scorer"], s_emb, p_emb, "sp_", ctx)
        q_po = self._scorer.query_vec(params["scorer"], o_emb, p_inv, "sp_", ctx)
        return q_sp, q_po

    def dot_candidates_all(self, params, ctx=None, padded: bool = False):
        ctx = ctx or Ctx()
        embedder = self.get_s_embedder()
        try:
            emb = embedder.embed_all(
                params["entity_embedder"], ctx, padded=padded
            )
        except TypeError:  # embedder without a padded variant
            emb = embedder.embed_all(params["entity_embedder"], ctx)
        cand = self._scorer.candidate_vec(params["scorer"], emb, "sp_", ctx)
        return cand, cand

    def dot_candidates(self, params, entity_ids, ctx=None,
                       sides=("sp", "po")):
        # Both query sides are "sp_"-form under reciprocal rewriting, so
        # one candidate matrix serves both; compute it iff any side asks.
        ctx = ctx or Ctx()
        if not sides:
            return None, None
        emb = self.get_s_embedder().embed(
            params["entity_embedder"], entity_ids, ctx
        )
        cand = self._scorer.candidate_vec(params["scorer"], emb, "sp_", ctx)
        return (cand if "sp" in sides else None,
                cand if "po" in sides else None)

    def score_sp_po(self, params, s, p, o, entity_subset=None, ctx=None):
        ctx = ctx or Ctx()
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        p_inv = self.get_p_embedder().embed(
            params["relation_embedder"], p + self.dataset.num_relations(), ctx
        )
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        if entity_subset is not None:
            all_entities = self.get_s_embedder().embed(
                params["entity_embedder"], entity_subset, ctx
            )
        else:
            all_entities = self.get_s_embedder().embed_all(
                params["entity_embedder"], ctx
            )
        sp_scores = self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, all_entities, "sp_", ctx
        )
        po_scores = self._scorer.score_emb(
            params["scorer"], o_emb, p_inv, all_entities, "sp_", ctx
        )
        return jnp.concatenate([sp_scores, po_scores], axis=1)
