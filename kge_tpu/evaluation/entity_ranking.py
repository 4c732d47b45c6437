"""Entity-ranking evaluation: filtered MRR / Hits@K via rank counting.

Re-design of the reference protocol (reference:
kge/job/eval_entity_ranking.py) around the key observation that ranking
by *comparison counting* — rank = #(scores > true), ties = #(scores ≈
true) — is already the TPU-ideal formulation: no sort, no top-k, just
reductions over a [B, 2C] score matrix per entity chunk. Under a mesh,
the entity chunk axis shards over "model" and the per-chunk counts
reduce with psum; here the single-device path accumulates counts across
chunks on host.

Exact reference semantics preserved:
- filtering by masking true answers to -inf before counting
- tie detection with rtol/atol against the true score; tie policies
  rounded_mean/best/worst (eval_entity_ranking.py:571-618)
- rank histograms (length E) -> MR / MRR / Hits@K for raw / filtered /
  filtered_with_test, plus head/tail, relation-type, and frequency
  drill-downs (eval_entity_ranking.py:620-741)
- true scores are computed through the same sp_/_po scoring path as the
  chunk scores (floating-point-consistency trick,
  eval_entity_ranking.py:186-203), with an spo-vs-sp_ consistency check
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.models import Ctx
from kge_tpu.evaluation.eval import EvaluationJob
from kge_tpu.train.job import Job

NEG_INF = -jnp.inf


from kge_tpu.utils.misc import pow2_bucket as _bucket


class EntityRankingJob(EvaluationJob):
    def __init__(self, config, dataset, parent_job=None, model=None):
        super().__init__(config, dataset, parent_job, model=model)
        self.config.check("train.trace_level", ["epoch", "batch"])
        # copy: Config.get returns leaf lists by reference, and appending
        # in place would leak the eval split into the shared Config (and
        # into every job built from it afterwards)
        self.filter_splits: List[str] = list(self.config.get(
            "entity_ranking.filter_splits"
        ))
        if self.eval_split not in self.filter_splits:
            self.filter_splits.append(self.eval_split)
        self.filter_with_test: bool = self.config.get(
            "entity_ranking.filter_with_test"
        )
        self.tie_handling: str = self.config.check(
            "entity_ranking.tie_handling.type",
            ["rounded_mean_rank", "best_rank", "worst_rank"],
        )
        self.tie_atol = float(self.config.get("entity_ranking.tie_handling.atol"))
        self.tie_rtol = float(self.config.get("entity_ranking.tie_handling.rtol"))
        self.tie_warn_only = self.config.get(
            "entity_ranking.tie_handling.warn_only"
        )
        self.hits_at_k_s: List[int] = self.config.get("entity_ranking.hits_at_k_s")
        self.chunk_size: int = self.config.get("entity_ranking.chunk_size")
        self.head_and_tail = self.config.get(
            "entity_ranking.metrics_per.head_and_tail"
        )
        self.hist_hooks = [hist_all]
        if self.config.get("entity_ranking.metrics_per.relation_type"):
            self.hist_hooks.append(hist_per_relation_type)
        if self.config.get("entity_ranking.metrics_per.argument_frequency"):
            self.hist_hooks.append(hist_per_frequency_percentile)
        self.implementation = self.config.check(
            "entity_ranking.implementation", ["auto", "generic", "fused"]
        )
        try:
            self.eval_precision = self.config.check(
                "tpu.eval_matmul_precision", ["default", "high", "highest"]
            )
        except KeyError:
            self.eval_precision = "highest"
        self._chunk_fn = None
        self._true_fn = None
        self._fused_query_fn = None
        self._spo_fn = None  # None: untested, False: unsupported
        if self.__class__ == EntityRankingJob:
            for f in Job.job_created_hooks:
                f(self)

    def _prepare(self):
        self.triples = self.dataset.split(self.eval_split)
        # label indexes for filtering
        for split in self.filter_splits:
            self.dataset.index(f"{split}_sp_to_o")
            self.dataset.index(f"{split}_po_to_s")
        if "test" not in self.filter_splits and self.filter_with_test:
            self.dataset.index("test_sp_to_o")
            self.dataset.index("test_po_to_s")
        if self.config.get("entity_ranking.metrics_per.relation_type"):
            self.dataset.index("relations_per_type")
        if self.config.get("entity_ranking.metrics_per.argument_frequency"):
            self.dataset.index("frequency_percentiles")

    # ------------------------------------------------------------------ coords

    def _collect_coords(self, triples: np.ndarray, splits: List[str]):
        """Per-row answer sets from the given splits, as padded arrays.

        Returns (sp_coords [B, Lo], po_coords [B, Ls]) of *global* entity
        ids; padding value 2^30 (always out of chunk range)."""
        B = len(triples)
        sp_rows, sp_vals, po_rows, po_vals = [], [], [], []
        for split in splits:
            sp_index = self.dataset.index(f"{split}_sp_to_o")
            po_index = self.dataset.index(f"{split}_po_to_s")
            r, v = sp_index.get_all_coords(triples[:, [0, 1]])
            sp_rows.append(r)
            sp_vals.append(v)
            r, v = po_index.get_all_coords(triples[:, [1, 2]])
            po_rows.append(r)
            po_vals.append(v)

        def pad(rows_list, vals_list, self_vals):
            rows = np.concatenate(rows_list) if rows_list else np.zeros(0, int)
            vals = np.concatenate(vals_list) if vals_list else np.zeros(0, int)
            # dedupe (row, val) pairs: splits can repeat answers, and the
            # fused path subtracts per coordinate
            if len(rows):
                enc = rows.astype(np.int64) * (2 ** 31) + vals
                enc = np.unique(enc)
                rows = (enc // (2 ** 31)).astype(np.int64)
                vals = (enc % (2 ** 31)).astype(np.int64)
                # remove the current example itself: the reference zeroes
                # it out of the label tensor before filtering
                # (eval_entity_ranking.py:287-290), so the true answer
                # keeps its finite score and still counts in the tie set
                keep = vals != self_vals[rows]
                rows, vals = rows[keep], vals[keep]
            counts = np.bincount(rows, minlength=B).astype(np.int64)
            L = _bucket(int(counts.max()) if len(counts) else 1)
            out = np.full((B, L), 2 ** 30, dtype=np.int32)
            col = np.concatenate([np.arange(c) for c in counts if c > 0]) \
                if len(vals) else np.zeros(0, dtype=np.int64)
            out[rows, col] = vals
            return out

        return (
            pad(sp_rows, sp_vals, triples[:, 2].astype(np.int64)),
            pad(po_rows, po_vals, triples[:, 0].astype(np.int64)),
        )

    # ------------------------------------------------------------------ compiled fns

    def _model_mesh(self):
        """The mesh when the entity table is sharded over a >1 'model'
        axis, else None. The fused path wraps its rank-count kernel in
        ``jax.shard_map`` over this mesh: each shard streams its local
        [V/shard, D] table block through the kernel and the per-shard
        greater/tie counts psum over 'model' (counts are additive over
        candidate subsets), so the fast path and the sharded path are the
        same path (SURVEY.md section 2.5 sharded rank-counting)."""
        try:
            params, _ = self._current_params()
            sharding = params["entity_embedder"]["weights"].sharding
            mesh = getattr(sharding, "mesh", None)
            spec = getattr(sharding, "spec", None)
            if mesh is None or spec is None:
                return None
            vocab_sharded = any(
                axis == "model" and mesh.shape.get("model", 1) > 1
                for axis in jax.tree_util.tree_leaves(tuple(spec))
            )
            return mesh if vocab_sharded else None
        except Exception:
            return None

    def _use_fused(self) -> bool:
        if self.implementation == "fused":
            return True
        return (
            self.implementation == "auto"
            and hasattr(self.model, "supports_dot_ranking")
            and self.model.supports_dot_ranking()
        )

    def _score_precision(self) -> str:
        """ONE matmul precision for every score the ranking compares.
        The fused path is pinned to highest because the Pallas kernel's
        candidate dot is (Mosaic lowers only HIGHEST/DEFAULT, and the
        tie contract wants exact f32); true/label/spo scores must live
        in the same score space or tie counting corrupts. The knob
        therefore only applies to the generic path."""
        if self._use_fused():
            return "highest"
        return self.eval_precision

    def _build_true_fn(self):
        model = self.model
        precision = self._score_precision()

        def true_scores(params, model_state, s, p, o):
            with jax.default_matmul_precision(precision):
                ctx = Ctx(train=False, state=model_state)
                o_true = self.model.score_sp(params, s, p, o_subset=o, ctx=ctx)
                o_true = jnp.diagonal(o_true)
                s_true = model.score_po(params, p, o, s_subset=s, ctx=ctx)
                s_true = jnp.diagonal(s_true)
                return o_true, s_true

        return jax.jit(true_scores)

    def _build_spo_fn(self):
        model = self.model
        precision = self._score_precision()

        def spo_scores(params, model_state, s, p, o):
            with jax.default_matmul_precision(precision):
                ctx = Ctx(train=False, state=model_state)
                o_spo = model.score_spo(params, s, p, o, direction="o",
                                        ctx=ctx)
                s_spo = model.score_spo(params, s, p, o, direction="s",
                                        ctx=ctx)
                return o_spo, s_spo

        return jax.jit(spo_scores)

    def _spo_consistency_scores(self, params, model_state, s, p, o):
        """Device half of the spo-vs-sp_ consistency check: dispatch the
        triple-wise scoring, defer the (synchronizing) comparison."""
        if self._spo_fn is False:
            return None
        if self._spo_fn is None:
            try:
                self._spo_fn = self._build_spo_fn()
                self._spo_fn(params, model_state, s, p, o)
            except (ValueError, NotImplementedError):
                self._spo_fn = False  # model cannot score spo both ways
                return None
        return self._spo_fn(params, model_state, s, p, o)

    def _check_spo_consistency(self, spo_pair, o_true, s_true):
        """spo-vs-sp_ floating point consistency check (reference:
        eval_entity_ranking.py:240-274): the triple-wise scoring path
        must agree with the matrix path within the tie tolerances."""
        if spo_pair is None:
            return
        o_spo, s_spo = spo_pair
        for name, spo_v, true_v in [("sp_", o_spo, o_true),
                                    ("_po", s_spo, s_true)]:
            a, b = np.asarray(spo_v), np.asarray(true_v)
            close = np.isclose(a, b, rtol=self.tie_rtol, atol=self.tie_atol)
            if not close.all():
                diff = float(np.abs(a - b).max())
                msg = (
                    f"spo scores differ from {name} scores beyond the tie "
                    f"tolerances (max abs diff {diff:.3e})"
                )
                if self.tie_warn_only:
                    self.config.log("WARNING: " + msg)
                else:
                    raise ValueError(msg)

    def _build_chunk_fn(self, num_rankings: int):
        model = self.model
        atol, rtol = self.tie_atol, self.tie_rtol

        from kge_tpu.ops.pallas.rank_count import greater_tie_counts

        def counts_for(scores, true):
            return greater_tie_counts(
                scores, true[:, None], True, axis=1, atol=atol, rtol=rtol
            )

        def chunk_counts(params, model_state, s, p, o, chunk_ids, col_valid,
                         chunk_start, coords_sp, coords_po, o_true, s_true):
            """coords_*: [num_rankings-1, B, L] global label ids (raw has
            none). Returns [num_rankings, 4, B] (o_rank, o_tie, s_rank,
            s_tie)."""
            # chunk scores MUST share the true scores' matmul precision:
            # on TPU a lower ambient default would put candidate and
            # true scores in different score spaces and corrupt ties
            with jax.default_matmul_precision(self.eval_precision):
                return chunk_counts_inner(
                    params, model_state, s, p, o, chunk_ids, col_valid,
                    chunk_start, coords_sp, coords_po, o_true, s_true,
                )

        def chunk_counts_inner(params, model_state, s, p, o, chunk_ids,
                               col_valid, chunk_start, coords_sp, coords_po,
                               o_true, s_true):
            ctx = Ctx(train=False, state=model_state)
            C = chunk_ids.shape[0]
            scores = model.score_sp_po(params, s, p, o, entity_subset=chunk_ids,
                                       ctx=ctx)
            scores = scores.astype(jnp.float32)
            sp = jnp.where(col_valid[None, :], scores[:, :C], NEG_INF)
            po = jnp.where(col_valid[None, :], scores[:, C:], NEG_INF)
            B = sp.shape[0]
            rows = jnp.arange(B)[:, None]
            out = []
            sp_v, po_v = sp, po
            # variant 0 = raw (unfiltered)
            r, t = counts_for(sp, o_true)
            r2, t2 = counts_for(po, s_true)
            out.append(jnp.stack([r, t, r2, t2]))
            for k in range(num_rankings - 1):
                local_sp = coords_sp[k] - chunk_start
                local_sp = jnp.where(
                    (coords_sp[k] >= chunk_start)
                    & (local_sp < C), local_sp, C
                )
                local_po = coords_po[k] - chunk_start
                local_po = jnp.where(
                    (coords_po[k] >= chunk_start)
                    & (local_po < C), local_po, C
                )
                sp_v = sp_v.at[rows, local_sp].set(NEG_INF, mode="drop")
                po_v = po_v.at[rows, local_po].set(NEG_INF, mode="drop")
                r, t = counts_for(sp_v, o_true)
                r2, t2 = counts_for(po_v, s_true)
                out.append(jnp.stack([r, t, r2, t2]))
            return jnp.stack(out)  # [num_rankings, 4, B]

        return jax.jit(chunk_counts, static_argnames=())

    # -------------------------------------------------------------- fused path

    def _build_fused_batch_fn(self, num_rankings: int):
        """ONE compiled program per batch: dot-form queries, one fused
        Pallas rank-count call per side over the full candidate set
        (the kernel grid streams candidate tiles — entity_ranking.
        chunk_size only applies to the generic path), and filtering by
        coordinate-count subtraction.

        Filtering by counting: instead of masking label positions to
        -inf in a dense score matrix, score ONLY the label coordinates
        and subtract their greater/tie contributions from the raw
        counts — same semantics, no [B, E] materialization at all."""
        from kge_tpu.ops.pallas.rank_count import (
            greater_tie_counts, rank_counts
        )

        model = self.model
        atol, rtol = self.tie_atol, self.tie_rtol
        num_entities = self.dataset.num_entities()
        interpret = jax.default_backend() == "cpu"
        mesh = self._model_mesh()

        monotone = (
            getattr(model, "dot_score_space", lambda: "native")()
            == "monotone"
        )

        def counts(q, cand, true, valid):
            """rank_counts, shard_mapped over the mesh when the candidate
            table is vocab-sharded: queries shard over 'data', candidates
            stay in place over 'model', per-shard counts psum."""
            if mesh is None:
                return rank_counts(q, cand, true, valid, atol=atol,
                                   rtol=rtol, interpret=interpret)
            from jax.sharding import PartitionSpec as P

            data = mesh.shape.get("data", 1)
            B = q.shape[0]
            Bp = -(-B // data) * data
            # pad the batch to divide 'data'; padded rows rank against
            # true=+inf (count 0 everywhere) and are sliced off below
            qp = jnp.zeros((Bp, q.shape[1]), q.dtype).at[:B].set(q)
            tp = jnp.full((Bp,), jnp.inf, jnp.float32).at[:B].set(true)

            def local(qs, cand_local, ts, valid_local):
                r, t = rank_counts(qs, cand_local, ts, valid_local,
                                   atol=atol, rtol=rtol,
                                   interpret=interpret)
                return (jax.lax.psum(r, "model"),
                        jax.lax.psum(t, "model"))

            r, t = jax.shard_map(
                local, mesh=mesh,
                in_specs=(P("data", None), P("model", None), P("data"),
                          P("model")),
                out_specs=(P("data"), P("data")),
                # pallas_call's out_shape carries no varying-mesh-axes
                # annotation, so the vma check cannot see through it
                check_vma=False,
            )(qp, cand, tp, valid)
            return r[:B], t[:B]

        def fn(params, model_state, s, p, o, coords_sp, coords_po,
               o_true, s_true):
            # "highest", always: the Pallas kernel's candidate dot is
            # pinned there, and every score entering the counting must
            # share its score space (see _score_precision)
            with jax.default_matmul_precision("highest"):
                ctx = Ctx(train=False, state=model_state)
                q_sp, q_po = model.dot_queries(params, s, p, o, ctx=ctx)
                if monotone:
                    # the dot form is a monotone transform of the native
                    # score (e.g. L2 distance expansion): true scores must
                    # come from the SAME dot path so candidate/true live in
                    # one score space and tie tolerances apply consistently
                    # (same floating-point-consistency trick the reference
                    # uses, eval_entity_ranking.py:186-203)
                    cand_o_sp, _ = model.dot_candidates(
                        params, o, ctx=ctx, sides=("sp",)
                    )
                    _, cand_s_po = model.dot_candidates(
                        params, s, ctx=ctx, sides=("po",)
                    )
                    o_true = jnp.einsum("bd,bd->b", q_sp, cand_o_sp)
                    s_true = jnp.einsum("bd,bd->b", q_po, cand_s_po)
                # NaN -> -inf before counting (the rank kernel's contract;
                # the generic path sanitizes the same way) so a NaN-scoring
                # model ranks last instead of first
                o_true = jnp.where(jnp.isnan(o_true), NEG_INF, o_true)
                s_true = jnp.where(jnp.isnan(s_true), NEG_INF, s_true)
                B = q_sp.shape[0]

                # ONE kernel call per side over the full candidate set:
                # the Pallas grid IS the chunking (it streams [tc, D]
                # candidate tiles through VMEM), so no host-chosen chunk
                # loop and — for identity candidate transforms — no
                # materialized candidate copies at all; the kernel reads
                # the embedding table directly. Under the mesh, the
                # PADDED table is used (its length divides the 'model'
                # axis, which shard_map requires; an unpadded
                # num_entities generally does not) with padding rows
                # masked invalid; jnp.pad covers embedders without a
                # padded table.
                cand_sp, cand_po = model.dot_candidates_all(
                    params, ctx=ctx, padded=mesh is not None
                )
                C = cand_sp.shape[0]
                model_axis = mesh.shape.get("model", 1) if mesh else 1
                Cp = -(-C // model_axis) * model_axis
                if Cp != C:
                    cand_sp = jnp.pad(cand_sp, ((0, Cp - C), (0, 0)))
                    cand_po = jnp.pad(cand_po, ((0, Cp - C), (0, 0)))
                    C = Cp
                valid = (
                    jnp.arange(C, dtype=jnp.int32) < num_entities
                ).astype(jnp.float32)
                r0, t0 = counts(q_sp, cand_sp, o_true, valid)
                r1, t1 = counts(q_po, cand_po, s_true, valid)
                raw = jnp.stack([r0, t0, r1, t1]).astype(jnp.int32)

                def coord_counts(q, coords, true, side):
                    # coords: [V-1, B, L] global entity ids (2^30 padding)
                    valid = coords < num_entities
                    ids = jnp.minimum(coords, num_entities - 1)
                    cand_sp, cand_po = model.dot_candidates(
                        params, ids, ctx=ctx, sides=(side,)
                    )
                    cand = cand_sp if side == "sp" else cand_po
                    scores = jnp.einsum("bd,vbld->vbl", q, cand)
                    return greater_tie_counts(
                        scores, true[None, :, None], valid, axis=2,
                        atol=atol, rtol=rtol,
                    )

                sp_sub_r, sp_sub_t = coord_counts(q_sp, coords_sp, o_true, "sp")
                po_sub_r, po_sub_t = coord_counts(q_po, coords_po, s_true, "po")
                # totals[v, 4, B]: v=0 raw, v>0 filtered by subtraction.
                # Clamp at zero: the einsum label-score path and the Pallas
                # kernel can classify a score at the exact tie boundary
                # differently (float noise), and a negative count would
                # crash the host-side histogram bincount. Ties clamp at 1
                # (the true answer always ties with itself).
                totals = [raw]
                for k in range(num_rankings - 1):
                    totals.append(jnp.stack([
                        jnp.maximum(raw[0] - sp_sub_r[k], 0),
                        jnp.maximum(raw[1] - sp_sub_t[k], 1),
                        jnp.maximum(raw[2] - po_sub_r[k], 0),
                        jnp.maximum(raw[3] - po_sub_t[k], 1),
                    ]))
                return jnp.stack(totals)

        return jax.jit(fn)

    def _final_ranks(self, rank: np.ndarray, ties: np.ndarray) -> np.ndarray:
        if self.tie_handling == "rounded_mean_rank":
            return rank + ties // 2
        if self.tie_handling == "best_rank":
            return rank
        return rank + np.maximum(ties - 1, 0)

    def _accumulate_batch(self, hists, rankings, totals, batch,
                          example_traces, B):
        """Finalize ranks per variant, update histograms + example traces."""
        s_np, p_np, o_np = batch[:, 0], batch[:, 1], batch[:, 2]
        batch_ranks = {}
        for v, suffix in enumerate(rankings):
            o_rank = self._final_ranks(totals[v, 0], totals[v, 1])
            s_rank = self._final_ranks(totals[v, 2], totals[v, 3])
            batch_ranks[suffix] = (s_rank, o_rank)
            for f in self.hist_hooks:
                f(hists[v], s_np, p_np, o_np, s_rank, o_rank, job=self)
        if self.trace_examples:
            for i in range(B):
                entry = dict(
                    type="entity_ranking", scope="example",
                    split=self.eval_split, epoch=self.epoch,
                    s=int(s_np[i]), p=int(p_np[i]), o=int(o_np[i]),
                )
                for suffix in rankings:
                    s_rank, o_rank = batch_ranks[suffix]
                    entry[f"rank_s{suffix}"] = int(s_rank[i]) + 1
                    entry[f"rank_o{suffix}"] = int(o_rank[i]) + 1
                example_traces.append(entry)

    # ------------------------------------------------------------------ evaluate

    def _evaluate(self):
        if not self._is_prepared:
            self._prepare()
            self._is_prepared = True
        params, model_state = self._current_params()
        num_entities = self.dataset.num_entities()
        filter_with_test = (
            "test" not in self.filter_splits and self.filter_with_test
        )
        rankings = ["", "_filtered"] + (
            ["_filtered_with_test"] if filter_with_test else []
        )
        if self._true_fn is None:
            self._true_fn = self._build_true_fn()
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk_fn(len(rankings))

        chunk_size = self.chunk_size if self.chunk_size > 0 else num_entities
        num_chunks = math.ceil(num_entities / chunk_size)
        use_fused = self._use_fused()

        hists: List[Dict[str, np.ndarray]] = [dict() for _ in rankings]
        epoch_time = -time.time()
        self.current_trace["epoch"] = dict(
            type="entity_ranking",
            scope="epoch",
            split=self.eval_split,
            filter_splits=self.filter_splits,
            epoch=self.epoch,
            batches=math.ceil(len(self.triples) / self.batch_size),
            size=len(self.triples),
        )
        for f in self.pre_epoch_hooks:
            f(self)

        # Dispatch phase: every batch's device work is enqueued without a
        # single device->host fetch (a fetch costs a full tunnel/dispatch
        # round trip); results are pulled and post-processed after the
        # last batch is in flight.
        example_traces = []
        pending = []
        for start in range(0, len(self.triples), self.batch_size):
            for f in self.pre_batch_hooks:
                f(self)
            batch = self.triples[start : start + self.batch_size]
            B = len(batch)
            s = jnp.asarray(batch[:, 0].astype(np.int32))
            p = jnp.asarray(batch[:, 1].astype(np.int32))
            o = jnp.asarray(batch[:, 2].astype(np.int32))
            o_true, s_true = self._true_fn(params, model_state, s, p, o)
            spo_pair = self._spo_consistency_scores(
                params, model_state, s, p, o
            )

            # label coordinates per filtered ranking (deduped per row)
            coord_sets = [self._collect_coords(batch, self.filter_splits)]
            if filter_with_test:
                coord_sets.append(
                    self._collect_coords(batch, self.filter_splits + ["test"])
                )
            # pad coordinate arrays to a common bucketed width
            L = _bucket(max(cs[0].shape[1] for cs in coord_sets) if coord_sets
                        else 1)
            Lp = _bucket(max(cs[1].shape[1] for cs in coord_sets))

            def pad_to(a, width):
                if a.shape[1] == width:
                    return a
                out = np.full((a.shape[0], width), 2 ** 30, dtype=np.int32)
                out[:, : a.shape[1]] = a
                return out

            coords_sp = np.stack([pad_to(cs[0], L) for cs in coord_sets])
            coords_po = np.stack([pad_to(cs[1], Lp) for cs in coord_sets])

            if use_fused:
                if self._fused_query_fn is None:
                    self._fused_query_fn = self._build_fused_batch_fn(
                        len(rankings)
                    )
                totals_dev = self._fused_query_fn(
                    params, model_state, s, p, o,
                    jnp.asarray(coords_sp), jnp.asarray(coords_po),
                    o_true, s_true,
                )
            else:
                totals_dev = None
                for c in range(num_chunks):
                    chunk_start = c * chunk_size
                    ids = np.arange(chunk_start, chunk_start + chunk_size)
                    col_valid = ids < num_entities
                    ids = np.minimum(ids, num_entities - 1)
                    counts = self._chunk_fn(
                        params, model_state, s, p, o,
                        jnp.asarray(ids.astype(np.int32)),
                        jnp.asarray(col_valid),
                        jnp.int32(chunk_start),
                        jnp.asarray(coords_sp), jnp.asarray(coords_po),
                        o_true, s_true,
                    )
                    totals_dev = (
                        counts if totals_dev is None else totals_dev + counts
                    )
            pending.append((batch, B, totals_dev, spo_pair, o_true, s_true))
            for f in self.post_batch_hooks:
                f(self)

        # Fetch phase: one bulk transfer after all device work is enqueued.
        # (fetch_global = device_get plus cross-process replication of any
        # mesh-sharded count arrays under multi-host)
        from kge_tpu.parallel.distributed import fetch_global

        pending = fetch_global(pending)
        for batch, B, totals_dev, spo_pair, o_true, s_true in pending:
            self._check_spo_consistency(spo_pair, o_true, s_true)
            totals = np.asarray(totals_dev, dtype=np.int64)
            self._accumulate_batch(
                hists, rankings, totals, batch, example_traces, B
            )

        for entry in example_traces:
            self.config.trace(**entry)

        # metrics from merged histograms
        metrics: Dict[str, float] = {}
        for key in hists[0].keys():
            name = "_" + key if key != "all" else ""
            for v, suffix in enumerate(rankings):
                metrics.update(
                    self._compute_metrics(hists[v][key], suffix=suffix + name)
                )
        epoch_time += time.time()
        self.current_trace["epoch"].update(
            dict(epoch_time=epoch_time, event="eval_completed", **metrics)
        )
        for f in self.post_epoch_hooks:
            f(self)

    def _compute_metrics(self, rank_hist: np.ndarray, suffix="") -> Dict[str, float]:
        """MR / MRR / Hits@K from a histogram of 0-based ranks
        (reference: eval_entity_ranking.py:620-649)."""
        metrics = {}
        n = float(rank_hist.sum())
        ranks = np.arange(1, len(rank_hist) + 1, dtype=np.float64)
        metrics["mean_rank" + suffix] = (
            float(np.sum(rank_hist * ranks) / n) if n > 0 else 0.0
        )
        metrics["mean_reciprocal_rank" + suffix] = (
            float(np.sum(rank_hist / ranks) / n) if n > 0 else 0.0
        )
        max_k = max(self.hits_at_k_s)
        hits = (
            np.cumsum(rank_hist[: max_k]) / n
            if n > 0 else np.zeros(max_k)
        )
        for k in self.hits_at_k_s:
            metrics[f"hits_at_{k}{suffix}"] = float(hits[min(k, len(hits)) - 1])
        return metrics


# HISTOGRAM HOOKS ###########################################################


def hist_all(hists, s, p, o, s_ranks, o_ranks, job, **kwargs):
    """Overall (and optionally head/tail) histograms of 0-based ranks."""
    E = job.dataset.num_entities()
    if "all" not in hists:
        hists["all"] = np.zeros(E)
    hists["all"] += np.bincount(o_ranks, minlength=E)
    hists["all"] += np.bincount(s_ranks, minlength=E)
    if job.head_and_tail:
        if "head" not in hists:
            hists["head"] = np.zeros(E)
            hists["tail"] = np.zeros(E)
        hists["tail"] += np.bincount(o_ranks, minlength=E)
        hists["head"] += np.bincount(s_ranks, minlength=E)


def _rel_type_lookup(job):
    """Cached relation-id -> type-name membership masks: one id-indexed
    boolean array per type (a relation can carry only one type, but the
    array form keeps per-batch work at one gather instead of per-element
    set membership — minutes at Wikidata scale otherwise)."""
    cached = getattr(job, "_rel_type_masks", None)
    if cached is None:
        R = job.dataset.num_relations()
        cached = {}
        for rel_type, rels in job.dataset.index("relations_per_type").items():
            mask = np.zeros(R, dtype=bool)
            mask[np.fromiter(rels, dtype=np.int64, count=len(rels))] = True
            cached[rel_type] = mask
        job._rel_type_masks = cached
    return cached


def hist_per_relation_type(hists, s, p, o, s_ranks, o_ranks, job, **kwargs):
    E = job.dataset.num_entities()
    for rel_type, rel_mask in _rel_type_lookup(job).items():
        if rel_type not in hists:
            hists[rel_type] = np.zeros(E)
        mask = rel_mask[p]
        if mask.any():
            hists[rel_type] += np.bincount(o_ranks[mask], minlength=E)
            hists[rel_type] += np.bincount(s_ranks[mask], minlength=E)
        if job.head_and_tail:
            for side, ranks in [("head", s_ranks), ("tail", o_ranks)]:
                key = f"{rel_type}_{side}"
                if key not in hists:
                    hists[key] = np.zeros(E)
                if mask.any():
                    hists[key] += np.bincount(ranks[mask], minlength=E)


def _freq_perc_lookup(job):
    """Cached id-indexed membership masks per (argument, percentile)."""
    cached = getattr(job, "_freq_perc_masks", None)
    if cached is None:
        percs = job.dataset.index("frequency_percentiles")
        sizes = {
            "subject": job.dataset.num_entities(),
            "object": job.dataset.num_entities(),
            "relation": job.dataset.num_relations(),
        }
        cached = {}
        for arg, by_perc in percs.items():
            for perc, ids in by_perc.items():
                mask = np.zeros(sizes[arg], dtype=bool)
                if len(ids):
                    mask[np.fromiter(ids, dtype=np.int64, count=len(ids))] \
                        = True
                cached[(arg, perc)] = mask
        job._freq_perc_masks = cached
    return cached


def hist_per_frequency_percentile(hists, s, p, o, s_ranks, o_ranks, job,
                                  **kwargs):
    E = job.dataset.num_entities()
    percs = job.dataset.index("frequency_percentiles")
    lookup = _freq_perc_lookup(job)
    for perc in percs["subject"].keys():
        for arg, ids, ranks in [
            ("subject", s, s_ranks),
            ("relation", p, s_ranks),
            ("object", o, o_ranks),
        ]:
            key = f"{arg}_{perc}"
            if key not in hists:
                hists[key] = np.zeros(E)
            mask = lookup[(arg, perc)][ids]
            if mask.any():
                hists[key] += np.bincount(ranks[mask], minlength=E)
        # relation percentile also counts object ranks
        key = f"relation_{perc}"
        mask = lookup[("relation", perc)][p]
        if mask.any():
            hists[key] += np.bincount(o_ranks[mask], minlength=E)
