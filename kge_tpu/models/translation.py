"""Distance-based scorers: TransE, RotatE, TransH.

Reference math: kge/model/{transe,rotate,transh}.py. The pairwise
combines materialize [n, m, d] difference tensors; evaluation chunking
bounds m. For L2 (TransE l_norm=2, RotatE) the scorers additionally
expose a *monotone dot form* — ||q-c||^2 = ||q||^2 + ||c||^2 - 2 q.c,
so ranking reduces to q~ . c~ with q~ = [2q, -1], c~ = [c, ||c||^2] —
which routes evaluation through the fused Pallas rank-count kernel with
no [B, C, d] materialization (see RelationalScorer.dot_score_space for
the tie-tolerance caveat). TransH's candidate projection depends on the
query row's relation, so it has no shared candidate matrix and keeps
the broadcast path; so does L1."""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeModel, RelationalScorer


def _lp_norm(x: jnp.ndarray, p: float, axis: int) -> jnp.ndarray:
    if p == 1.0:
        return jnp.sum(jnp.abs(x), axis=axis)
    if p == 2.0:
        return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-30)
    return jnp.sum(jnp.abs(x) ** p, axis=axis) ** (1.0 / p)


def _lp_norm_nonneg(x: jnp.ndarray, p: float, axis: int) -> jnp.ndarray:
    """Lp norm when inputs are known non-negative (skips abs for p=1)."""
    if p == 1.0:
        return jnp.sum(x, axis=axis)
    return _lp_norm(x, p, axis)


def _l2_dot_query(q: jnp.ndarray) -> jnp.ndarray:
    """[2q, -1]: paired with _l2_dot_candidate this yields
    q~ . c~ = 2 q.c - ||c||^2 = ||q||^2 - ||q-c||^2, a per-row monotone
    transform of the negative L2 distance score."""
    return jnp.concatenate([2.0 * q, -jnp.ones_like(q[..., :1])], axis=-1)


def _l2_dot_candidate(c: jnp.ndarray) -> jnp.ndarray:
    """[c, ||c||^2]: the candidate side of the L2 expansion."""
    sq = jnp.sum(c * c, axis=-1, keepdims=True)
    return jnp.concatenate([c, sq], axis=-1)


class TransEScorer(RelationalScorer):
    """score = -||s + p - o||_p."""

    dot_score_space = "monotone"

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))

    @property
    def supports_dot_form(self) -> bool:
        return self._norm == 2.0

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        q = a_emb + p_emb if combine == "sp_" else a_emb - p_emb
        return _l2_dot_query(q)

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return _l2_dot_candidate(cand_emb)

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        if combine == "spo":
            out = -_lp_norm(s_emb + p_emb - o_emb, self._norm, axis=1)
        elif combine == "sp_":
            out = -_lp_norm(
                (s_emb + p_emb)[:, None, :] - o_emb[None, :, :], self._norm, axis=2
            )
        elif combine == "_po":
            out = -_lp_norm(
                (o_emb - p_emb)[:, None, :] - s_emb[None, :, :], self._norm, axis=2
            )
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class TransE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(config, dataset, TransEScorer,
                         configuration_key=configuration_key,
                         init_for_load_only=init_for_load_only)

    def prepare_job(self, job, **kwargs):
        super().prepare_job(job, **kwargs)
        # batchwise negative scoring of TransE materializes large
        # difference tensors; prefer triple-wise (reference: transe.py:57-69)
        if (job.config.get("train.type") == "negative_sampling"
                and job.config.get("negative_sampling.implementation") == "auto"):
            job.config.set("negative_sampling.implementation", "triple", log=True)


class RotatEScorer(RelationalScorer):
    """Relations are per-dimension rotations on the complex plane:
    score = -||s*p - o||, with the conjugate trick for _po."""

    dot_score_space = "monotone"

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))

    @property
    def supports_dot_form(self) -> bool:
        # the per-dim complex modulus collapses into one euclidean norm
        # over the stored [re || im] layout only for l_norm = 2
        return self._norm == 2.0

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        half = a_emb.shape[-1] // 2
        a_re, a_im = a_emb[..., :half], a_emb[..., half:]
        p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)
        if combine == "sp_":
            q_re = a_re * p_re - a_im * p_im
            q_im = a_re * p_im + a_im * p_re
        else:  # "_po": || s*p - o || = || s - conj(p)*o ||
            q_re = p_re * a_re + p_im * a_im
            q_im = p_re * a_im - p_im * a_re
        return _l2_dot_query(jnp.concatenate([q_re, q_im], axis=-1))

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return _l2_dot_candidate(cand_emb)

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        half = s_emb.shape[1] // 2
        s_re, s_im = s_emb[:, :half], s_emb[:, half:]
        o_re, o_im = o_emb[:, :half], o_emb[:, half:]
        p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)
        if combine == "spo":
            sp_re = s_re * p_re - s_im * p_im
            sp_im = s_re * p_im + s_im * p_re
            diff_abs = jnp.sqrt((sp_re - o_re) ** 2 + (sp_im - o_im) ** 2)
            out = -_lp_norm_nonneg(diff_abs, self._norm, axis=1)
        elif combine == "sp_":
            sp_re = s_re * p_re - s_im * p_im
            sp_im = s_re * p_im + s_im * p_re
            d_re = sp_re[:, None, :] - o_re[None, :, :]
            d_im = sp_im[:, None, :] - o_im[None, :, :]
            out = -_lp_norm_nonneg(jnp.sqrt(d_re ** 2 + d_im ** 2), self._norm, axis=2)
        elif combine == "_po":
            # || s*p - o || = || s - conj(p)*o || for unit rotations p
            po_re = p_re * o_re + p_im * o_im
            po_im = p_re * o_im - p_im * o_re
            d_re = po_re[:, None, :] - s_re[None, :, :]
            d_im = po_im[:, None, :] - s_im[None, :, :]
            out = -_lp_norm_nonneg(jnp.sqrt(d_re ** 2 + d_im ** 2), self._norm, axis=2)
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class RotatE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        if self.get_option("entity_embedder.dim") % 2 != 0:
            raise ValueError("RotatE requires even entity embedding dimension")
        if self.get_option("relation_embedder.dim") < 0:
            self.set_option(
                "relation_embedder.dim",
                self.get_option("entity_embedder.dim") // 2,
                create=True, log=True,
            )
        super().__init__(config, dataset, RotatEScorer,
                         configuration_key=self.configuration_key,
                         init_for_load_only=init_for_load_only)
        self._normalize_phases = self.get_option("normalize_phases")

    def normalize_params(self, params):
        params = super().normalize_params(params)
        if self._normalize_phases:
            # wrap relation phases into [-pi, pi) without changing scores
            phases = params["relation_embedder"]["weights"]
            phases = jnp.remainder(phases + math.pi, 2.0 * math.pi) - math.pi
            params = dict(params)
            params["relation_embedder"] = {
                **params["relation_embedder"], "weights": phases
            }
        return params


class TransHScorer(RelationalScorer):
    """TransE on a per-relation hyperplane: entities are projected onto
    the plane with normal w_p before translation."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))

    @staticmethod
    def _transfer(ent: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
        )
        return ent - jnp.sum(ent * normal, axis=-1, keepdims=True) * normal

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        half = p_emb.shape[1] // 2
        rel, normal = p_emb[:, :half], p_emb[:, half:]
        if combine == "spo":
            out = -_lp_norm(
                self._transfer(s_emb, normal) + rel - self._transfer(o_emb, normal),
                self._norm, axis=1,
            )
        elif combine == "sp_":
            s_t = self._transfer(s_emb, normal) + rel                 # [n, d]
            o_t = self._transfer(o_emb[None, :, :], normal[:, None, :])  # [n, m, d]
            out = -_lp_norm(s_t[:, None, :] - o_t, self._norm, axis=2)
        elif combine == "_po":
            o_t = self._transfer(o_emb, normal) - rel                 # [n, d]
            s_t = self._transfer(s_emb[None, :, :], normal[:, None, :])  # [n, m, d]
            out = -_lp_norm(o_t[:, None, :] - s_t, self._norm, axis=2)
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class TransH(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        # relation embedding holds [translation || hyperplane normal]
        dim = config.get_default(self.configuration_key + ".relation_embedder.dim")
        if dim < 0:
            ent_dim = config.get_default(
                self.configuration_key + ".entity_embedder.dim"
            )
            config.set(
                self.configuration_key + ".relation_embedder.dim",
                ent_dim * 2, create=True, log=True,
            )
        super().__init__(config, dataset, TransHScorer,
                         configuration_key=self.configuration_key,
                         init_for_load_only=init_for_load_only)
        self.soft_constraint_weight = float(self.get_option("C"))

    def penalties(self, params, ctx: Ctx, batch=None, **kwargs
                  ) -> List[Tuple[str, jnp.ndarray]]:
        result = super().penalties(params, ctx, batch=batch, **kwargs)
        if self.soft_constraint_weight > 0.0:
            ent = self.get_s_embedder().embed_all(params["entity_embedder"], ctx)
            p_ent = jnp.sum(
                jnp.maximum(jnp.sum(ent * ent, axis=1) - 1.0, 0.0)
            )
            rel_all = self.get_p_embedder().embed_all(
                params["relation_embedder"], ctx
            )
            half = rel_all.shape[1] // 2
            rel, normal = rel_all[:, :half], rel_all[:, half:]
            eps = 1e-6
            ratio = jnp.sum(rel * normal, axis=-1) / (
                jnp.linalg.norm(rel, axis=1) + eps
            )
            p_rel = jnp.sum(jnp.maximum(ratio ** 2 - eps ** 2, 0.0))
            result += [
                ("transh.soft_constraints_ent", self.soft_constraint_weight * p_ent),
                ("transh.soft_constraints_rel", self.soft_constraint_weight * p_rel),
            ]
        return result
