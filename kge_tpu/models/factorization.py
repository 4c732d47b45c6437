"""Bilinear / factorization scorers: ComplEx, DistMult, CP, SimplE,
RESCAL, RelationalTucker3.

Each scorer is a pure function of (s_emb, p_emb, o_emb, combine). The
``sp_``/``_po`` combines are expressed as a single [n, d] x [d, m] matmul
— the MXU-shaped hot op that shards over the mesh entity axis during
ranking (reference scorer math: kge/model/{complex,distmult,cp,simple,
rescal,relational_tucker3}.py)."""

from __future__ import annotations

import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeModel, RelationalScorer
from kge_tpu.models.embedder.projection import rescal_set_relation_embedder_dim


class DistMultScorer(RelationalScorer):
    """score = <s, p, o> (ternary dot product)."""

    supports_dot_form = True

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        return a_emb * p_emb

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return cand_emb

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        if combine == "spo":
            out = jnp.sum(s_emb * p_emb * o_emb, axis=1)
        elif combine == "sp_":
            out = (s_emb * p_emb) @ o_emb.T
        elif combine == "_po":
            out = (o_emb * p_emb) @ s_emb.T
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class ComplExScorer(RelationalScorer):
    """ComplEx via the Hadamard column-block trick (Trouillon et al. 2016,
    Eq. 11): stack (re, im, re, im) blocks so the score is one real
    elementwise product + reduction/matmul."""

    supports_dot_form = True

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        # fold the complex product into the QUERY so candidates stay the
        # RAW [C, d] embedding rows: score = Re((s.p) conj(e)) =
        # [q_re || q_im] . [e_re || e_im]. Halves the rank-count
        # matmul's contraction width and removes the per-chunk [C, 2d]
        # candidate materialization of the block-trick form (the eval
        # hot path streams the whole entity table per batch).
        half = a_emb.shape[1] // 2
        a_re, a_im = a_emb[:, :half], a_emb[:, half:]
        p_re, p_im = p_emb[:, :half], p_emb[:, half:]
        if combine == "sp_":
            q_re = a_re * p_re - a_im * p_im
            q_im = a_re * p_im + a_im * p_re
        else:  # "_po": candidates are subjects; a_emb is o
            q_re = p_re * a_re + p_im * a_im
            q_im = p_re * a_im - p_im * a_re
        return jnp.concatenate([q_re, q_im], axis=1)

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return cand_emb

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        half = p_emb.shape[1] // 2
        p_re, p_im = p_emb[:, :half], p_emb[:, half:]
        o_re, o_im = o_emb[:, :half], o_emb[:, half:]
        s_all = jnp.concatenate([s_emb, s_emb], axis=1)          # re im re im
        r_all = jnp.concatenate([p_re, p_emb, -p_im], axis=1)     # re re im -im
        o_all = jnp.concatenate([o_emb, o_im, o_re], axis=1)      # re im im re
        if combine == "spo":
            out = jnp.sum(s_all * o_all * r_all, axis=1)
        elif combine == "sp_":
            out = (s_all * r_all) @ o_all.T
        elif combine == "_po":
            out = (r_all * o_all) @ s_all.T
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class CPScorer(RelationalScorer):
    """Canonical Polyadic: subject uses the first embedding half, object
    the second."""

    supports_dot_form = True

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        half = a_emb.shape[1] // 2
        if combine == "sp_":
            return a_emb[:, :half] * p_emb
        return a_emb[:, half:] * p_emb

    def candidate_vec(self, params, cand_emb, combine, ctx):
        half = cand_emb.shape[-1] // 2
        if combine == "sp_":
            return cand_emb[..., half:]
        return cand_emb[..., :half]

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        half = s_emb.shape[1] // 2
        s_h = s_emb[:, :half]
        o_t = o_emb[:, half:]
        if combine == "spo":
            out = jnp.sum(s_h * p_emb * o_t, axis=1)
        elif combine == "sp_":
            out = (s_h * p_emb) @ o_t.T
        elif combine == "_po":
            out = (o_t * p_emb) @ s_h.T
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class SimplEScorer(RelationalScorer):
    """SimplE: average of forward (head-half) and backward (tail-half)
    CP scores."""

    supports_dot_form = True

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        half = a_emb.shape[1] // 2
        a_h, a_t = a_emb[:, :half], a_emb[:, half:]
        p_f, p_b = p_emb[:, :half], p_emb[:, half:]
        if combine == "sp_":
            return jnp.concatenate([a_h * p_f, a_t * p_b], axis=1) / 2.0
        return jnp.concatenate([a_t * p_f, a_h * p_b], axis=1) / 2.0

    def candidate_vec(self, params, cand_emb, combine, ctx):
        half = cand_emb.shape[-1] // 2
        c_h, c_t = cand_emb[..., :half], cand_emb[..., half:]
        if combine == "sp_":
            return jnp.concatenate([c_t, c_h], axis=-1)
        return jnp.concatenate([c_h, c_t], axis=-1)

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        half = s_emb.shape[1] // 2
        s_h, s_t = s_emb[:, :half], s_emb[:, half:]
        p_f, p_b = p_emb[:, :half], p_emb[:, half:]
        o_h, o_t = o_emb[:, :half], o_emb[:, half:]
        if combine == "spo":
            out1 = jnp.sum(s_h * p_f * o_t, axis=1)
            out2 = jnp.sum(s_t * p_b * o_h, axis=1)
        elif combine == "sp_":
            out1 = (s_h * p_f) @ o_t.T
            out2 = (s_t * p_b) @ o_h.T
        elif combine == "_po":
            out1 = (o_t * p_f) @ s_h.T
            out2 = (o_h * p_b) @ s_t.T
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return ((out1 + out2) / 2.0).reshape(n, -1)


class RescalScorer(RelationalScorer):
    """score = s^T M_p o with per-relation mixing matrix M_p."""

    supports_dot_form = True

    def query_vec(self, params, a_emb, p_emb, combine, ctx):
        dim = a_emb.shape[-1]
        p_mix = p_emb.reshape(-1, dim, dim)
        if combine == "sp_":
            return jnp.einsum("nd,nde->ne", a_emb, p_mix)
        return jnp.einsum("nde,ne->nd", p_mix, a_emb)

    def candidate_vec(self, params, cand_emb, combine, ctx):
        return cand_emb

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx: Ctx):
        n = p_emb.shape[0]
        dim = s_emb.shape[-1]
        p_mix = p_emb.reshape(-1, dim, dim)
        if combine == "spo":
            out = jnp.sum(jnp.einsum("nd,nde->ne", s_emb, p_mix) * o_emb, axis=-1)
        elif combine == "sp_":
            out = jnp.einsum("nd,nde->ne", s_emb, p_mix) @ o_emb.T
        elif combine == "_po":
            out = jnp.einsum("nde,ne->nd", p_mix, o_emb) @ s_emb.T
        else:
            return self._generic_combine(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class DistMult(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(config, dataset, DistMultScorer,
                         configuration_key=configuration_key,
                         init_for_load_only=init_for_load_only)


class ComplEx(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(config, dataset, ComplExScorer,
                         configuration_key=configuration_key,
                         init_for_load_only=init_for_load_only)


class CP(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        if self.get_option("entity_embedder.dim") % 2 != 0:
            raise ValueError("CP requires even entity embedding dimension")
        if self.get_option("relation_embedder.dim") < 0:
            self.set_option(
                "relation_embedder.dim",
                self.get_option("entity_embedder.dim") // 2,
                create=True, log=True,
            )
        super().__init__(config, dataset, CPScorer,
                         configuration_key=self.configuration_key,
                         init_for_load_only=init_for_load_only)


class SimplE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        if self.get_option("entity_embedder.dim") % 2 != 0:
            raise ValueError("SimplE requires even entity embedding dimension")
        super().__init__(config, dataset, SimplEScorer,
                         configuration_key=self.configuration_key,
                         init_for_load_only=init_for_load_only)


class Rescal(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        rescal_set_relation_embedder_dim(
            config, dataset, self.configuration_key + ".relation_embedder"
        )
        super().__init__(config, dataset, RescalScorer,
                         configuration_key=self.configuration_key,
                         init_for_load_only=init_for_load_only)


class RelationalTucker3(KgeModel):
    """RESCAL scorer over a Tucker3-projected relation embedder
    (reference: kge/model/relational_tucker3.py)."""

    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        # the tucker3 relation embedder expands its dim to entity_dim^2
        super().__init__(config, dataset, RescalScorer,
                         configuration_key=self.configuration_key,
                         init_for_load_only=init_for_load_only)
