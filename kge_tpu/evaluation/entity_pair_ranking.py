"""Entity-pair ranking evaluation.

The reference registers this job type but never implements it
(reference: kge/job/eval_entity_pair_ranking.py:4-12 is an empty stub);
here the protocol is implemented: for each test triple (s, p, o), the
true pair (s, o) is ranked against ALL entity pairs (s', o') scored
under relation p. Reported metrics are mean_rank / mean_reciprocal_rank
/ hits_at_k, raw and filtered (true pairs of p from the filter splits
removed).

TPU formulation: ranks are greater/tie counts, never sorts. Queries are
processed in BATCHES — one compiled dispatch per batch covers the whole
E x E pair matrix of every query in it (the subject-chunk loop is a
``lax.fori_loop`` inside the jitted program, so no per-chunk host round
trips), filtering subtracts counts over the (typically short) true-pair
lists in a second batched call, and all device results are fetched once
at the end (the deferred-fetch discipline of entity ranking). Cost is
O(E) score_sp rows per query; intended for analysis on small/medium
graphs (the protocol itself is quadratic in the entity count).
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

    def _build_batch_fn(self, num_chunks: int, chunk: int):
        """One dispatch per query batch: fori_loop over subject chunks,
        each iteration scoring a [Bq*chunk, E] block and accumulating
        per-query greater/tie counts."""
        model = self.model
        atol, rtol = self.tie_atol, self.tie_rtol

        def batch_counts(params, model_state, p_batch, true_scores,
                         id_padded, valid_padded):
            from kge_tpu.ops.pallas.rank_count import greater_tie_counts

            ctx = Ctx(train=False, state=model_state)
            bq = p_batch.shape[0]

            def body(c, acc):
                g_acc, t_acc = acc
                s_chunk = jax.lax.dynamic_slice(
                    id_padded, (c * chunk,), (chunk,)
                )
                valid = jax.lax.dynamic_slice(
                    valid_padded, (c * chunk,), (chunk,)
                )
                s_rep = jnp.tile(s_chunk, bq)
                p_rep = jnp.repeat(p_batch, chunk)
                scores = model.score_sp(params, s_rep, p_rep, ctx=ctx)
                scores = scores.reshape(bq, chunk, -1)
                g, t = greater_tie_counts(
                    scores, true_scores[:, None, None],
                    valid[None, :, None], axis=(1, 2),
                    atol=atol, rtol=rtol,
                )
                # accumulate unsigned: the count domain is E^2 (int32
                # wraps negative past ~46k entities; uint32 covers the
                # whole range this quadratic protocol is feasible for —
                # _evaluate rejects E > 65535)
                return (g_acc + g.astype(jnp.uint32),
                        t_acc + t.astype(jnp.uint32))

            init = (jnp.zeros(bq, jnp.uint32), jnp.zeros(bq, jnp.uint32))
            return jax.lax.fori_loop(0, num_chunks, body, init)

        return jax.jit(batch_counts)

    def _build_filter_fn(self):
        """Counts over each query's true-pair list ([Bq, L] coordinate
        arrays), scored directly with score_spo."""
        model = self.model
        atol, rtol = self.tie_atol, self.tie_rtol

        def filter_counts(params, model_state, s_ids, p_batch, o_ids,
                          fvalid, true_scores):
            from kge_tpu.ops.pallas.rank_count import greater_tie_counts

            ctx = Ctx(train=False, state=model_state)
            bq, L = s_ids.shape
            p_rep = jnp.repeat(p_batch, L)
            scores = model.score_spo(
                params, s_ids.reshape(-1), p_rep, o_ids.reshape(-1),
                direction="o", ctx=ctx,
            ).reshape(bq, L)
            return greater_tie_counts(
                scores, true_scores[:, None], fvalid, axis=1,
                atol=atol, rtol=rtol,
            )

        return jax.jit(filter_counts)

    # ------------------------------------------------------------------ evaluate

    def _evaluate(self):
        if not hasattr(self, "triples") or self.triples is None:
            self.triples = self.dataset.split(self.eval_split)
        params, model_state = self._current_params()
        E = self.dataset.num_entities()
        if E > 65535:
            raise ValueError(
                "entity_pair_ranking ranks every query against E^2 "
                f"entity pairs; E={E} exceeds both the 32-bit count "
                "range and the practical cost of the quadratic protocol "
                "(intended for small/medium analysis graphs)"
            )
        chunk = self.chunk_size if self.chunk_size > 0 else E
        num_chunks = math.ceil(E / chunk)
        model = self.model

        # query batch size: honor eval.batch_size but keep each
        # dispatch's [Bq, chunk, E] score block under ~256 MiB f32
        bq = max(1, min(int(self.batch_size),
                        (64 << 20) // max(chunk * E, 1)))

        # true pairs per relation over the filter splits (host, encoded,
        # built once per job: vectorized encode + stable groupby — a
        # per-triple python loop here would dominate validation epochs)
        if getattr(self, "_pairs_by_p", None) is None:
            pairs_by_p: Dict[int, set] = {}
            for split in self.filter_splits:
                tr = np.asarray(self.dataset.split(split))
                if not len(tr):
                    continue
                enc = tr[:, 0].astype(np.int64) * E + tr[:, 2].astype(np.int64)
                order = np.argsort(tr[:, 1], kind="stable")
                ps, starts = np.unique(tr[order, 1], return_index=True)
                enc_sorted = enc[order]
                bounds = list(starts[1:]) + [len(enc_sorted)]
                for p, lo, hi in zip(ps, starts, bounds):
                    pairs_by_p.setdefault(int(p), set()).update(
                        enc_sorted[lo:hi].tolist()
                    )
            self._pairs_by_p = pairs_by_p
        pairs_by_p = self._pairs_by_p

        epoch_time = -time.time()
        self.current_trace["epoch"] = dict(
            type="entity_pair_ranking", scope="epoch", split=self.eval_split,
            filter_splits=self.filter_splits, epoch=self.epoch,
            size=len(self.triples),
        )
        for f in self.pre_epoch_hooks:
            f(self)

        # compiled fns cached across evaluations (valid.every=1 would
        # otherwise recompile every epoch)
        if getattr(self, "_batch_fns", None) is None:
            self._batch_fns: Dict = {}
        batch_fn = self._batch_fns.get((num_chunks, chunk))
        if batch_fn is None:
            batch_fn = self._build_batch_fn(num_chunks, chunk)
            self._batch_fns[(num_chunks, chunk)] = batch_fn
        if getattr(self, "_filter_fn", None) is None:
            self._filter_fn = self._build_filter_fn()
            self._spo_fn = jax.jit(
                lambda params, state, s, p, o: model.score_spo(
                    params, s, p, o, direction="o", ctx=Ctx(state=state)
                )
            )
        filter_fn = self._filter_fn
        spo_fn = self._spo_fn

        entity_ids = np.arange(E, dtype=np.int32)
        pad = (-E) % chunk
        id_padded = jnp.asarray(np.concatenate(
            [entity_ids, np.zeros(pad, np.int32)]
        ))
        valid_padded = jnp.asarray(np.concatenate(
            [np.ones(E, bool), np.zeros(pad, bool)]
        ))

        triples = np.asarray(self.triples)

        # ---------------- dispatch phase: no device->host fetches ----------------
        pending = []
        for start in range(0, len(triples), bq):
            batch = triples[start:start + bq]
            n = len(batch)
            s_b = np.zeros(bq, np.int32)
            p_b = np.zeros(bq, np.int32)
            o_b = np.zeros(bq, np.int32)
            s_b[:n], p_b[:n], o_b[:n] = batch[:, 0], batch[:, 1], batch[:, 2]
            true_scores = spo_fn(
                params, model_state, jnp.asarray(s_b), jnp.asarray(p_b),
                jnp.asarray(o_b),
            )
            # padded query rows rank against true=+inf -> zero counts
            if n < bq:
                true_scores = true_scores.at[n:].set(jnp.inf)
            g, t = batch_fn(params, model_state, jnp.asarray(p_b),
                            true_scores, id_padded, valid_padded)

            # filtered: per-query true pairs of p minus the query pair
            encs = [
                sorted(pairs_by_p.get(int(p), set()) - {int(s) * E + int(o)})
                for s, p, o in batch
            ]
            L = _bucket(max((len(e) for e in encs), default=0) or 1)
            s_ids = np.zeros((bq, L), np.int32)
            o_ids = np.zeros((bq, L), np.int32)
            fvalid = np.zeros((bq, L), bool)
            for i, enc in enumerate(encs):
                s_ids[i, : len(enc)] = [e // E for e in enc]
                o_ids[i, : len(enc)] = [e % E for e in enc]
                fvalid[i, : len(enc)] = True
            fg, ft = filter_fn(
                params, model_state, jnp.asarray(s_ids), jnp.asarray(p_b),
                jnp.asarray(o_ids), jnp.asarray(fvalid), true_scores,
            )
            pending.append((n, g, t, fg, ft))

        # ---------------- one bulk fetch, then host post-processing ----------------
        pending = jax.device_get(pending)
        ranks: List[Dict[str, int]] = []
        for n, g, t, fg, ft in pending:
            for i in range(n):
                g_raw, t_raw = int(g[i]), int(t[i])
                # clamp: the chunked score_sp path and the score_spo path
                # can disagree within float noise (the discrepancy entity
                # ranking guards with its consistency check); never let
                # the filtered counts go below the true pair itself
                g_f = max(g_raw - int(fg[i]), 0)
                t_f = max(t_raw - int(ft[i]), 1)
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
