"""Entity-pair ranking evaluation.

The reference registers this job type but never implements it
(reference: kge/job/eval_entity_pair_ranking.py:4-12 is an empty stub);
here the protocol is implemented: for each test triple (s, p, o), the
true pair (s, o) is ranked against ALL entity pairs (s', o') scored
under relation p. Reported metrics are mean_rank / mean_reciprocal_rank
/ hits_at_k, raw and filtered (true pairs of p from the filter splits
removed).

TPU formulation: ranks are greater/tie counts, never sorts. The E x E
pair-score matrix for one query is streamed as subject chunks — each
chunk is one ``score_sp(s_chunk, p)`` call producing a [C, E] block —
and per-block counts accumulate on device. Filtering subtracts counts
over the (typically short) true-pair list by scoring those pairs
directly with ``score_spo``. Cost is O(E) score_sp rows per query;
intended for analysis on small/medium graphs (the protocol itself is
quadratic in the entity count).
"""

from __future__ import annotations

import math
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.evaluation.eval import EvaluationJob
from kge_tpu.evaluation.entity_ranking import _bucket
from kge_tpu.models import Ctx
from kge_tpu.train.job import Job


class EntityPairRankingJob(EvaluationJob):
    def __init__(self, config, dataset, parent_job=None, model=None):
        super().__init__(config, dataset, parent_job, model=model)
        self.chunk_size = config.get("entity_pair_ranking.chunk_size")
        self.hits_at_k_s = list(config.get("entity_ranking.hits_at_k_s"))
        self.tie_atol = float(config.get("entity_ranking.tie_handling.atol"))
        self.tie_rtol = float(config.get("entity_ranking.tie_handling.rtol"))
        self.tie_handling = config.check(
            "entity_ranking.tie_handling.type",
            ["rounded_mean_rank", "best_rank", "worst_rank"],
        )
        self.filter_splits = list(
            config.get("entity_ranking.filter_splits") or ["train", "valid"]
        )
        if self.eval_split not in self.filter_splits:
            self.filter_splits = self.filter_splits + [self.eval_split]
        if self.__class__ == EntityPairRankingJob:
            for f in Job.job_created_hooks:
                f(self)

    # ------------------------------------------------------------------ device fns

    def _build_chunk_fn(self):
        model = self.model

        def chunk_counts(params, model_state, s_chunk, p, valid, true_score):
            """Counts over one [C, E] block of the pair-score matrix."""
            from kge_tpu.ops.pallas.rank_count import greater_tie_counts

            ctx = Ctx(train=False, state=model_state)
            scores = model.score_sp(params, s_chunk, p, ctx=ctx)
            g, t = greater_tie_counts(
                scores, jnp.asarray(true_score), valid[:, None], axis=None,
                atol=self.tie_atol, rtol=self.tie_rtol,
            )
            return g, t

        return chunk_counts

    # ------------------------------------------------------------------ evaluate

    def _evaluate(self):
        if not hasattr(self, "triples") or self.triples is None:
            self.triples = self.dataset.split(self.eval_split)
        params, model_state = self._current_params()
        E = self.dataset.num_entities()
        chunk = self.chunk_size if self.chunk_size > 0 else E
        num_chunks = math.ceil(E / chunk)
        model = self.model

        # true pairs per relation over the filter splits (host, encoded)
        pairs_by_p: Dict[int, set] = {}
        for split in self.filter_splits:
            tr = np.asarray(self.dataset.split(split))
            for s, p, o in tr:
                pairs_by_p.setdefault(int(p), set()).add(int(s) * E + int(o))

        epoch_time = -time.time()
        self.current_trace["epoch"] = dict(
            type="entity_pair_ranking", scope="epoch", split=self.eval_split,
            filter_splits=self.filter_splits, epoch=self.epoch,
            size=len(self.triples),
        )
        for f in self.pre_epoch_hooks:
            f(self)

        chunk_fn = jax.jit(self._build_chunk_fn())

        spo_fn = jax.jit(
            lambda params, state, s, p, o: model.score_spo(
                params, s, p, o, direction="o", ctx=Ctx(state=state)
            )
        )

        ranks: List[Dict[str, int]] = []
        entity_ids = np.arange(E, dtype=np.int32)
        pad = (-E) % chunk
        id_padded = np.concatenate([entity_ids,
                                    np.zeros(pad, np.int32)])
        valid_padded = np.concatenate([np.ones(E, bool),
                                       np.zeros(pad, bool)])

        for s, p, o in np.asarray(self.triples):
            s, p, o = int(s), int(p), int(o)
            true_score = spo_fn(
                params, model_state,
                jnp.asarray([s], jnp.int32), jnp.asarray([p], jnp.int32),
                jnp.asarray([o], jnp.int32),
            )[0]
            greater = jnp.int32(0)
            ties = jnp.int32(0)
            for c in range(num_chunks):
                s_chunk = jnp.asarray(id_padded[c * chunk:(c + 1) * chunk])
                valid = jnp.asarray(valid_padded[c * chunk:(c + 1) * chunk])
                p_vec = jnp.full(s_chunk.shape, p, jnp.int32)
                g, t = chunk_fn(params, model_state, s_chunk, p_vec, valid,
                                true_score)
                greater = greater + g
                ties = ties + t

            # filtered: subtract counts over the true pairs of p (minus
            # the query pair itself, which contributes to the tie count)
            enc = sorted(pairs_by_p.get(p, set()) - {s * E + o})
            fg = jnp.int32(0)
            ft = jnp.int32(0)
            if enc:
                L = _bucket(len(enc))
                s_ids = np.zeros(L, np.int32)
                o_ids = np.zeros(L, np.int32)
                fvalid = np.zeros(L, bool)
                s_ids[: len(enc)] = [e // E for e in enc]
                o_ids[: len(enc)] = [e % E for e in enc]
                fvalid[: len(enc)] = True
                p_vec = jnp.full((L,), p, jnp.int32)
                from kge_tpu.ops.pallas.rank_count import greater_tie_counts

                fscores = spo_fn(params, model_state,
                                 jnp.asarray(s_ids), p_vec,
                                 jnp.asarray(o_ids))
                fg, ft = greater_tie_counts(
                    fscores, true_score, jnp.asarray(fvalid), axis=None,
                    atol=self.tie_atol, rtol=self.tie_rtol,
                )

            g_raw, t_raw = int(greater), int(ties)
            # clamp: the chunked score_sp path and the score_spo path can
            # disagree within float noise (the discrepancy entity ranking
            # guards with its consistency check); never let the filtered
            # counts go below the true pair itself
            g_f = max(g_raw - int(fg), 0)
            t_f = max(t_raw - int(ft), 1)
            ranks.append({
                "rank": self._final_rank(g_raw, t_raw),
                "rank_filtered": self._final_rank(g_f, t_f),
            })

        metrics: Dict[str, float] = {}
        for suffix, key in (("", "rank"), ("_filtered", "rank_filtered")):
            rs = np.asarray([r[key] for r in ranks], dtype=np.float64) + 1.0
            metrics["mean_rank" + suffix] = float(rs.mean()) if len(rs) else 0.0
            metrics["mean_reciprocal_rank" + suffix] = (
                float((1.0 / rs).mean()) if len(rs) else 0.0
            )
            for k in self.hits_at_k_s:
                metrics[f"hits_at_{k}{suffix}"] = (
                    float((rs <= k).mean()) if len(rs) else 0.0
                )
        epoch_time += time.time()
        self.current_trace["epoch"].update(
            dict(epoch_time=epoch_time, event="eval_completed", **metrics)
        )
        for f in self.post_epoch_hooks:
            f(self)

    def _final_rank(self, greater: int, ties: int) -> int:
        # ties includes the true pair itself (its score is trivially
        # close to itself), mirroring entity ranking's conventions
        ties_excl = max(ties - 1, 0)
        if self.tie_handling == "rounded_mean_rank":
            return greater + (ties_excl + 1) // 2
        if self.tie_handling == "best_rank":
            return greater
        return greater + ties_excl
