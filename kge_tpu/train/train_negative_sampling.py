"""Negative-sampling training (reference:
kge/job/train_negative_sampling.py).

Per slot with num_samples > 0, scores are arranged [B, 1+num] (positives
in column 0, reference layout) and fed to the loss with
``num_negatives``. Scoring implementations:

- ``triple``: gather embeddings of every corrupted triple, row-wise spo
- ``all``: score against all candidates ([B, V] matmul), gather sampled
  columns — fastest when V is small or the scorer is matmul-shaped
- ``batch``: score against the batch's sample set only; for shared
  sampling this is a [B, num+1] matmul over the unique sample plus a
  static gather (the reference's shared fast path, static-shape form)

Graph sampling (per-epoch subgraph for GNN encoders) re-derives the
encoder's edge buffers each epoch (reference:
train_negative_sampling.py:53-64 and job/util.py:64-129).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from kge_tpu.models import Ctx
from kge_tpu.ops.gather import row_gather
from kge_tpu.train.job import Job
from kge_tpu.train.sampler import (
    SLOT_STR, SLOTS, KgeSampler, KgeUniformSampler, S, P, O,
)
from kge_tpu.train.train import TrainingJob


class TrainingJobNegativeSampling(TrainingJob):
    def __init__(self, config, dataset, parent_job=None, model=None,
                 forward_only=False):
        super().__init__(config, dataset, parent_job, model=model,
                         forward_only=forward_only)
        self._sampler = KgeSampler.create(config, "negative_sampling", dataset)
        from kge_tpu.utils.seed import rng_seed_from_config

        np_seed = rng_seed_from_config(config, "numpy")
        if np_seed >= 0:
            self._sampler.seed(np_seed + 1)
        self.type_str = "negative_sampling"
        if self.__class__ == TrainingJobNegativeSampling:
            for f in Job.job_created_hooks:
                f(self)

    # ------------------------------------------------------------------ sparse updates

    def _sparse_table_paths(self):
        """Row-sparse embedding updates (TPU counterpart of the torch
        sparse-Adagrad path behind ``lookup_embedder.sparse``): every
        index scored in a negative-sampling step is known up front, so
        gradients and optimizer state touch only those rows. Required at
        Wikidata5M-scale vocabularies where dense [V, D] updates dominate
        the step."""
        self._sparse_split = False
        self._sparse_pipeline = False
        config = self.config
        # canonical values are YAML-safe (unquoted on/off parse as YAML
        # booleans); accept legacy aliases
        raw = config.get("tpu.sparse_updates")
        aliases = {True: "always", False: "never", "on": "always",
                   "off": "never"}
        if raw in aliases:
            config.set("tpu.sparse_updates", aliases[raw], log=True)
        mode = config.check("tpu.sparse_updates", ["auto", "always", "never"])
        if mode == "never":
            return ()
        from kge_tpu.models.api import KgeModel
        from kge_tpu.models.embedder.lookup import LookupEmbedder
        from kge_tpu.models.reciprocal import ReciprocalRelationsModel
        from kge_tpu.train.optimizer import sparse_unsupported_reason

        m = self.model
        reasons = []
        r = sparse_unsupported_reason(config)
        if r:
            reasons.append(r)
        if config.get("train.subbatch_size") > 0:
            reasons.append("subbatch gradient accumulation is enabled")
        if config.get("negative_sampling.implementation") == "all":
            reasons.append("implementation 'all' scores every entity")
        if isinstance(m, ReciprocalRelationsModel):
            reasons.append("reciprocal model rewrites raw relation indices")
        if hasattr(m, "set_graph"):
            reasons.append("GNN encoder runs over the full graph")
        if type(m).penalties is not KgeModel.penalties:
            reasons.append(f"{type(m).__name__} defines whole-table penalties")
        if type(m).normalize_params is not KgeModel.normalize_params:
            reasons.append(f"{type(m).__name__} renormalizes full tables")
        for name, emb in (("entity", m.get_s_embedder()),
                          ("relation", m.get_p_embedder())):
            if type(emb) is not LookupEmbedder:
                reasons.append(f"{name} embedder is not a plain lookup table")
                continue
            if emb.normalize_p > 0:
                reasons.append(f"{name} embedder Lp-normalizes its table")
            if (emb.regularize
                    and emb.get_option("regularize_weight") != 0.0
                    and not emb.get_option("regularize_args.weighted")):
                reasons.append(f"{name} embedder has unweighted regularization")
        if not reasons and mode == "auto":
            # dense table updates cost O(V) per step, the sparse machinery
            # O(touched rows) plus constant overhead (unique, searchsorted,
            # scatter). Measured crossover on v5e is ~V/touched = 50; only
            # auto-enable with clear headroom. "always" skips this heuristic.
            ent_rows, _ = self._touched_row_counts()
            if self.dataset.num_entities() < 32 * ent_rows:
                reasons.append(
                    "entity vocabulary too small for sparse updates to pay "
                    f"({self.dataset.num_entities()} rows vs ~{ent_rows} "
                    "touched per batch)"
                )
        if not reasons:
            # Split-phase pipelining (loss program over gathered rows +
            # donated update+gather program) is OPT-IN: it has the best
            # theoretical step time (~0.07 ms update program) but the
            # donated big-buffer update program crashes the v5e worker
            # intermittently on the current remote-attached backend
            # (round-4 bisect: identical HLO runs clean standalone;
            # failure depends on dispatch history). The default at every
            # scale is the fused single program; past
            # tpu.sparse_scatter_limit_bytes its tables are stored as
            # row CHUNKS, each under the limit (train/chunking.py), so
            # the scatters stay in the sub-limit regime the platform
            # handles in place and reliably.
            split = config.check(
                "tpu.sparse_split_phases", ["auto", "always", "never"]
            )
            if split == "always":
                if self.mesh is not None:
                    raise ValueError(
                        "tpu.sparse_split_phases=always is not supported "
                        "under a device mesh"
                    )
                self._sparse_split = True
            # Past the per-shard scatter cap, the default escape is the
            # PIPELINED-GATHER single program (_build_train_step): step i
            # first scatters batch i-1's pending row updates — the
            # tables' FIRST consumer, so the update runs in place — then
            # gathers batch i's rows from the result and runs the loss
            # on them. The plain fused form gathers BEFORE the scatter,
            # which makes XLA materialize whole-table operand copies
            # (~17 ms/step flat at w5m scale).
            pipe = config.check(
                "tpu.sparse_pipelined_gather", ["auto", "always", "never"]
            )
            if not self._sparse_split and pipe == "always":
                # auto currently equals never: like every other in-place
                # big-table form (split phases, the Pallas row kernel),
                # the pipelined-gather program crashes the current
                # remote-attached v5e worker — identical HLO runs clean
                # in a minimal process, so this is a platform fault, not
                # a program property (round-4 bisect, docs/STATUS.md).
                # The fused XLA-scatter form (whole-table operand
                # copies, ~17 ms/step at w5m scale) is the reliable
                # default; flip auto here when the runtime is fixed.
                if self.mesh is not None:
                    raise ValueError(
                        "tpu.sparse_pipelined_gather=always is not "
                        "supported under a device mesh"
                    )
                self._sparse_pipeline = True
            self._resolve_table_chunks()
        if reasons:
            if mode == "always":
                raise ValueError(
                    "tpu.sparse_updates=always is not applicable here: "
                    + "; ".join(reasons)
                )
            if mode == "auto":
                config.log(
                    "Row-sparse updates not applicable: " + "; ".join(reasons)
                )
            return ()
        config.log("Using row-sparse embedding updates.")
        return ("entity_embedder.weights", "relation_embedder.weights")

    def _resolve_table_chunks(self):
        """Row-chunk tables that exceed tpu.sparse_scatter_limit_bytes
        (train/chunking.py): each chunk is a separate sub-limit device
        buffer, so the row scatters run in place and reliably at any
        vocabulary scale — measured on v5e: the monolithic fused step
        crashes the worker at 2.46 GiB while K-chunked forms run at
        in-place speed per-dispatch AND scanned
        (benchmarks/probe_chunked_sparse.py). Chunking therefore also
        lifts the steps_per_dispatch=1 restriction (_sparse_host_loop_only).

        ``tpu.sparse_table_chunks``: auto (split over-limit tables into
        ceil(bytes/limit) chunks), never, or an explicit chunk count
        (applied to both tables; used by CPU tests to exercise the
        chunked path on small vocabularies)."""
        import jax

        config = self.config
        raw = str(config.get("tpu.sparse_table_chunks")).strip()
        if raw == "never" or self._sparse_split or self._sparse_pipeline:
            return
        if config.get("tpu.sparse_row_kernel") == "always":
            return  # the in-place Pallas kernel is monolithic-only
        if self.mesh is not None or jax.process_count() > 1:
            return  # per-shard tables are already sub-limit (heuristic)
        if raw != "auto":
            try:
                forced = int(raw)
            except ValueError:
                raise ValueError(
                    "tpu.sparse_table_chunks must be auto, never, or a "
                    f"chunk count; got {raw!r}"
                )
        limit = int(config.get("tpu.sparse_scatter_limit_bytes"))
        from kge_tpu.train.chunking import num_chunks_for

        for path, emb in (
            ("entity_embedder.weights", self.model.get_s_embedder()),
            ("relation_embedder.weights", self.model.get_p_embedder()),
        ):
            table_bytes = emb.padded_vocab_size * emb.dim * 4
            if raw == "auto":
                k = num_chunks_for(table_bytes, limit)
            else:
                k = max(1, forced)
            if k > 1:
                self._table_chunks[path] = k

    def _touched_row_counts(self):
        """Static (entity, relation) bounds on rows touched per batch."""
        config = self.config
        batch_size = config.get("train.batch_size")
        shared = config.get("negative_sampling.shared")
        ent_rows, rel_rows = 2 * batch_size, batch_size
        nums = {
            key: config.get(f"negative_sampling.num_samples.{key}")
            for key in ("s", "p", "o")
        }
        # mirror the sampler's auto-complete exactly (sampler.py: S copies
        # O's original value, then O copies S's resolved value; P -> 0)
        orig_o = nums["o"]
        if nums["s"] < 0:
            nums["s"] = orig_o if orig_o > 0 else 0
        if nums["o"] < 0:
            nums["o"] = nums["s"] if nums["s"] > 0 else 0
        if nums["p"] < 0:
            nums["p"] = 0
        for key, n in nums.items():
            if n <= 0:
                continue
            extra = n + 1 if shared else batch_size * n
            if key == "p":
                rel_rows += extra
            else:
                ent_rows += extra
        return ent_rows, rel_rows

    def _use_row_kernel(self, table_bytes: int) -> bool:
        """Route one table's row-sparse update through the in-place
        Pallas kernel (ops/pallas/row_update.py). The kernel is correct
        and 16x faster than XLA's copying scatters in a STANDALONE
        donated program (1.09 ms vs 16.5 ms at w5m scale), but embedding
        it in the full train-step program crashes the current
        remote-attached v5e worker (same fault family as the split-phase
        pipeline — in-place writes to multi-GiB buffers inside large
        programs), so ``auto`` currently equals ``never``; the
        pipelined-gather step (_build_pipelined_gather_step) achieves
        in-place updates through operand ordering instead. ``always``
        forces the kernel at any size (interpret mode on CPU — tests;
        re-evaluate on future runtimes). ``table_bytes`` is accepted so
        a future auto policy can gate per table."""
        mode = self.config.check(
            "tpu.sparse_row_kernel", ["auto", "always", "never"]
        )
        if mode == "always":
            if self.mesh is not None:
                raise ValueError(
                    "tpu.sparse_row_kernel=always is not applicable "
                    "under a device mesh (pallas_call has no SPMD "
                    "partitioning rule)"
                )
            return True
        return False

    def _sparse_loss_grads(self, rows_e, rows_r, aux_params, model_state,
                           batch, rng):
        """Loss + gradients of the row-sparse step, expressed over the
        GATHERED rows (shared by the single-program step, which gathers
        in the same trace, and the pipelined split step, where the rows
        arrive from the previous update program). Returns (grads dict
        with rows_e/rows_r/rest, new_model_state, metrics)."""
        import jax

        model = self.model
        batch_size = self.batch_size
        batch2 = {k: v for k, v in batch.items()
                  if k not in ("uniq_e", "uniq_r")}
        rest = {
            k: v for k, v in aux_params.items()
            if k not in ("entity_embedder", "relation_embedder")
        }
        diff0 = {"rows_e": rows_e, "rows_r": rows_r, "rest": rest}

        def loss_fn(diff):
            params2 = {
                **diff["rest"],
                "entity_embedder": {
                    **{k: v for k, v in aux_params["entity_embedder"].items()
                       if k != "weights"},
                    "weights": diff["rows_e"],
                },
                "relation_embedder": {
                    **{k: v
                       for k, v in aux_params["relation_embedder"].items()
                       if k != "weights"},
                    "weights": diff["rows_r"],
                },
            }
            ctx = Ctx(train=True, rng=jax.random.fold_in(rng, 0),
                      state=model_state)
            loss = self._subbatch_loss(
                params2, ctx, batch2, slice(0, batch_size)
            )
            terms = model.penalties(
                params2, ctx, batch={"triples": batch2["triples"]}
            )
            penalty = 0.0
            for _, v in terms:
                penalty = penalty + v
            return loss + penalty, (ctx.updates, loss, penalty, dict(terms))

        (_, (updates, loss_value, penalty_total, penalty_dict)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(diff0)
        )
        new_model_state = (
            {**model_state, **updates} if updates else model_state
        )
        metrics = {
            "avg_loss": loss_value,
            "avg_penalty": penalty_total,
            "avg_cost": loss_value + penalty_total,
            **{f"avg_penalty_{k}": v for k, v in penalty_dict.items()},
        }
        return grads, new_model_state, metrics

    def _dense_leaf_update(self):
        """Dense optimizer update for the NON-table leaves of a sparse
        step; the table leaves (and their per-row optimizer state) pass
        through untouched. The table leaves are "__sparse__"-labeled
        (optax set_to_zero ignores their gradient VALUES entirely), so
        scalar placeholders stand in for [V, D] zeros — a zeros_like of
        a 2.3 GiB table inside the step program is exactly the kind of
        whole-table buffer the v5e backend fault is triggered by."""
        import jax

        optimizer = self.optimizer

        def placeholder(subtree):
            return {
                # chunked tables are tuples: one scalar per chunk
                k: (jax.tree_util.tree_map(lambda _: jnp.zeros(()), v)
                    if k == "weights" else jnp.zeros_like(v))
                for k, v in subtree.items()
            }

        def apply_dense(params, opt_state, grads, lrs):
            dense_grads = {
                **grads["rest"],
                "entity_embedder": placeholder(params["entity_embedder"]),
                "relation_embedder": placeholder(
                    params["relation_embedder"]
                ),
            }
            return optimizer.apply_updates(
                params, dense_grads, opt_state, lrs
            )

        return apply_dense

    def _sparse_update_fn(self, gather_next: bool):
        """Update phase of the row-sparse step: dense optimizer update
        for non-table leaves, row-wise Adagrad/SGD scatter for the
        tables. Contains NO model forward — past the 1 GiB fused
        scatter-fault cap it compiles as its own program with donated
        table buffers. With ``gather_next`` it ALSO gathers the next
        batch's rows from the just-updated tables: the big buffers are
        then touched by exactly one (donated) program per step, which is
        what keeps the scatters in place — a read-only dispatch pending
        on a buffer at donation time forces the runtime to copy the
        whole table (measured ~10 ms per 2.3 GiB table per step on v5e,
        vs 0.07 ms for the fused update+gather program)."""
        optimizer = self.optimizer
        dim = self.model.get_s_embedder().dim
        in_place_e = self._use_row_kernel(
            self.model.get_s_embedder().padded_vocab_size * dim * 4
        )
        in_place_r = self._use_row_kernel(
            self.model.get_p_embedder().padded_vocab_size
            * self.model.get_p_embedder().dim * 4
        )
        apply_dense = self._dense_leaf_update()

        def apply_phase(params, opt_state, uniq_e, uniq_r, grads, lrs):
            new_params, new_opt_state = apply_dense(
                params, opt_state, grads, lrs
            )
            sparse_state = dict(new_opt_state["sparse"])
            new_table_e, state_e = optimizer.sparse_row_update(
                "entity_embedder.weights",
                new_params["entity_embedder"]["weights"],
                sparse_state["entity_embedder.weights"],
                uniq_e, grads["rows_e"], lrs, in_place=in_place_e,
            )
            new_table_r, state_r = optimizer.sparse_row_update(
                "relation_embedder.weights",
                new_params["relation_embedder"]["weights"],
                sparse_state["relation_embedder.weights"],
                uniq_r, grads["rows_r"], lrs, in_place=in_place_r,
            )
            sparse_state["entity_embedder.weights"] = state_e
            sparse_state["relation_embedder.weights"] = state_r
            new_params = {
                **new_params,
                "entity_embedder": {
                    **new_params["entity_embedder"], "weights": new_table_e
                },
                "relation_embedder": {
                    **new_params["relation_embedder"], "weights": new_table_r
                },
            }
            new_opt_state = {**new_opt_state, "sparse": sparse_state}
            return new_params, new_opt_state

        if not gather_next:
            return apply_phase

        def apply_and_gather(params, opt_state, uniq_e, uniq_r, grads,
                             next_uniq_e, next_uniq_r, lrs):
            from kge_tpu.train.chunking import gather_rows

            new_params, new_opt_state = apply_phase(
                params, opt_state, uniq_e, uniq_r, grads, lrs
            )
            rows_e = gather_rows(
                new_params["entity_embedder"]["weights"], next_uniq_e
            )
            rows_r = gather_rows(
                new_params["relation_embedder"]["weights"], next_uniq_r
            )
            return new_params, new_opt_state, rows_e, rows_r

        return apply_and_gather

    def _make_step_fn(self):
        if not self._sparse_paths:
            return super()._make_step_fn()
        apply_phase = self._sparse_update_fn(gather_next=False)

        def step(params, opt_state, model_state, batch, lrs, rng):
            from kge_tpu.train.chunking import gather_rows

            uniq_e, uniq_r = batch["uniq_e"], batch["uniq_r"]
            rows_e = gather_rows(
                params["entity_embedder"]["weights"], uniq_e
            )
            rows_r = gather_rows(
                params["relation_embedder"]["weights"], uniq_r
            )
            grads, new_model_state, metrics = self._sparse_loss_grads(
                rows_e, rows_r, params, model_state, batch, rng
            )
            new_params, new_opt_state = apply_phase(
                params, opt_state, uniq_e, uniq_r, grads, lrs
            )
            return new_params, new_opt_state, new_model_state, metrics

        return step

    def _build_train_step(self):
        if self._sparse_paths and self._sparse_pipeline:
            return self._build_pipelined_gather_step()
        if not (self._sparse_paths and self._sparse_split):
            return super()._build_train_step()
        import jax

        # Past the fused scatter-fault cap the step runs PIPELINED over
        # two compiled programs, arranged so the big table buffers are
        # touched by exactly one (donated) program per step:
        #
        #   update_j(i-1): scatter batch i-1's row updates into the
        #                  donated tables AND gather batch i's rows from
        #                  the result
        #   loss_j(i):     forward/backward over batch i's GATHERED rows
        #                  only (never sees the tables)
        #
        # The update for the LAST batch of an epoch is flushed by
        # ``step.flush_pipeline`` (train.py calls it after the batch
        # loop), so params are fully up to date before validation /
        # checkpointing. Metrics are exact per batch (loss_j(i) runs on
        # parameters with all updates < i applied — the same sequential
        # semantics as the single-program step).
        donate = bool(self.config.get("tpu.donate_buffers"))
        loss_j = jax.jit(self._sparse_loss_grads)
        update_j = jax.jit(
            self._sparse_update_fn(gather_next=True),
            donate_argnums=(0, 1) if donate else (),
        )
        flush_j = jax.jit(
            self._sparse_update_fn(gather_next=False),
            donate_argnums=(0, 1) if donate else (),
        )

        def gather_fn(table_e, table_r, uniq_e, uniq_r):
            return (jnp.take(table_e, uniq_e, axis=0),
                    jnp.take(table_r, uniq_r, axis=0))

        gather_j = jax.jit(gather_fn)
        self.config.log(
            "Row-sparse updates run as pipelined split phases (table "
            "shard over tpu.sparse_scatter_limit_bytes): loss program "
            "over gathered rows + donated update+gather program."
        )
        pending = {}

        def strip_tables(params):
            return {
                k: (
                    {kk: vv for kk, vv in v.items() if kk != "weights"}
                    if k in ("entity_embedder", "relation_embedder")
                    else v
                )
                for k, v in params.items()
            }

        def step(params, opt_state, model_state, batch, lrs, rng):
            uniq_e, uniq_r = batch["uniq_e"], batch["uniq_r"]
            if "update" in pending:
                p_uniq_e, p_uniq_r, p_grads = pending.pop("update")
                params, opt_state, rows_e, rows_r = update_j(
                    params, opt_state, p_uniq_e, p_uniq_r, p_grads,
                    uniq_e, uniq_r, lrs,
                )
            else:  # first batch of the epoch: plain gather
                rows_e, rows_r = gather_j(
                    params["entity_embedder"]["weights"],
                    params["relation_embedder"]["weights"],
                    uniq_e, uniq_r,
                )
            grads, new_model_state, metrics = loss_j(
                rows_e, rows_r, strip_tables(params), model_state, batch,
                rng,
            )
            pending["update"] = (uniq_e, uniq_r, grads)
            return params, opt_state, new_model_state, metrics

        def flush_pipeline(params, opt_state, lrs):
            if "update" in pending:
                p_uniq_e, p_uniq_r, p_grads = pending.pop("update")
                params, opt_state = flush_j(
                    params, opt_state, p_uniq_e, p_uniq_r, p_grads, lrs
                )
            return params, opt_state

        step.flush_pipeline = flush_pipeline
        step.split_phases = {"gather": gather_j, "loss": loss_j,
                             "update": update_j, "flush": flush_j}
        return step

    def _stack_group_batches(self, buffered):
        """Grouped sparse dispatches add the DISPATCH-LEVEL row working
        set: ``guniq_e``/``guniq_r`` hold the sorted union of the k
        batches' touched rows (padded to a static size with distinct
        unreferenced fill ids, same contract as _add_row_index_payload's
        uniquify), and ``pos_e``/``pos_r`` [k, u] map each batch's uniq
        vector to positions in the union. _build_group_step runs the k
        steps entirely in this row space."""
        stacked = super()._stack_group_batches(buffered)
        if (not self._use_group_rowset() or "uniq_e" not in stacked):
            return stacked
        for key, emb in (
            ("e", self.model.get_s_embedder()),
            ("r", self.model.get_p_embedder()),
        ):
            uniq = stacked[f"uniq_{key}"]          # [k, u], sorted rows
            k_steps, u = uniq.shape
            vocab_pad = emb.padded_vocab_size
            size = min(k_steps * u, vocab_pad)
            union = np.unique(uniq.reshape(-1))
            if len(union) < size:
                n = size - len(union)
                window = np.arange(
                    max(vocab_pad - size - n, 0), vocab_pad,
                    dtype=union.dtype,
                )
                fill = np.setdiff1d(window, union)[-n:]
                union = np.sort(np.concatenate([union, fill]))
            stacked[f"guniq_{key}"] = union.astype(np.int32)
            stacked[f"pos_{key}"] = np.searchsorted(
                union, uniq
            ).astype(np.int32)
        return stacked

    def _build_group_step(self, k: int):
        """Grouped dispatch for the fused row-sparse step runs the k
        steps in a DISPATCH-LEVEL ROW WORKING SET: gather the union of
        the group's touched rows (and their Adagrad accumulator rows)
        from the tables ONCE, scan the k loss/update steps entirely in
        row space (scatters touch only the small [|union|, D] buffers),
        and scatter the net deltas back into the tables ONCE at the end
        of the program.

        Why: on the current v5e runtime every IN-PLACE big-table form
        crashes the worker (docs/STATUS.md; re-confirmed in round 5 for
        sub-limit chunked buffers inside the real program), so table
        scatters must stay in XLA's reliable COPYING regime — which
        costs ~17 ms of whole-table operand copies at Wikidata5M scale
        regardless of batch size. This step pays that tax once per
        DISPATCH instead of once per step: k=16 turns 17 ms/step into
        ~17/16 ms/step plus microseconds of row work.

        Semantics are exactly those of k per-batch fused dispatches:
        batch i's rows come from the working set that already carries
        all updates < i (the same values a table round-trip would
        yield), and fill rows receive zero gradient. The scan carries
        the tables untouched; only the final delta scatter consumes
        them.

        GATED OFF (``tpu.sparse_group_rowset`` auto == never): on the
        current v5e runtime this program crashes the worker at w5m
        scale on a verified-healthy backend — donated, undonated, and
        with the final scatter wrapped in a one-iteration scan (round-5
        probes; the fused-scan form run immediately before/after is
        fine, so it is this program's structure, not backend state).
        The reliable default is the base fused-scan group step (tables
        gathered+scattered inside each iteration; XLA lowers those
        scatters to whole-table copies — ~17 ms/step flat at w5m scale
        — which is slow but never faults). Flip ``auto`` when
        tests/test_tpu_canary.py reports the form surviving."""
        if not self._use_group_rowset():
            return super()._build_group_step(k)
        import jax
        from kge_tpu.train.chunking import gather_rows, scatter_rows_add

        apply_dense = self._dense_leaf_update()
        optimizer = self.optimizer
        adagrad = optimizer._opt_type == "adagrad"
        e_path = "entity_embedder.weights"
        r_path = "relation_embedder.weights"

        def many(params, opt_state, model_state, stacked, lrs, rng,
                 start_index):
            u_e, u_r = stacked["guniq_e"], stacked["guniq_r"]
            per_batch = {
                kk: v for kk, v in stacked.items()
                if not kk.startswith("guniq_")
            }
            w_e0 = gather_rows(params["entity_embedder"]["weights"], u_e)
            w_r0 = gather_rows(params["relation_embedder"]["weights"], u_r)
            if adagrad:
                acc = opt_state["sparse"]
                a_e0 = gather_rows(acc[e_path]["sum"], u_e)
                a_r0 = gather_rows(acc[r_path]["sum"], u_r)
            else:  # stateless SGD: zero-size placeholder carries
                a_e0 = jnp.zeros((0,), jnp.float32)
                a_r0 = jnp.zeros((0,), jnp.float32)

            def body(carry, i):
                (params, opt_state, model_state,
                 w_e, a_e, w_r, a_r) = carry
                batch = jax.tree_util.tree_map(
                    lambda v: jax.lax.dynamic_index_in_dim(
                        v, i, keepdims=False
                    ),
                    per_batch,
                )
                rows_e = jnp.take(w_e, batch["pos_e"], axis=0)
                rows_r = jnp.take(w_r, batch["pos_r"], axis=0)
                grads, model_state, metrics = self._sparse_loss_grads(
                    rows_e, rows_r, params, model_state, batch,
                    jax.random.fold_in(rng, start_index + i),
                )
                params, opt_state = apply_dense(
                    params, opt_state, grads, lrs
                )
                w_e, a_e = optimizer.sparse_rowset_update(
                    e_path, w_e, a_e if adagrad else None,
                    batch["pos_e"], grads["rows_e"], lrs,
                )
                w_r, a_r = optimizer.sparse_rowset_update(
                    r_path, w_r, a_r if adagrad else None,
                    batch["pos_r"], grads["rows_r"], lrs,
                )
                if not adagrad:
                    a_e, a_r = a_e0, a_r0
                return (params, opt_state, model_state,
                        w_e, a_e, w_r, a_r), metrics

            carry0 = (params, opt_state, model_state,
                      w_e0, a_e0, w_r0, a_r0)
            (params, opt_state, model_state, w_e, a_e, w_r, a_r), \
                metrics = jax.lax.scan(
                    body, carry0, jnp.arange(k, dtype=jnp.int32)
                )

            # The net-delta table scatter runs inside a ONE-iteration
            # scan: on the current v5e runtime, big-table scatters in
            # straight-line program tails take an in-place lowering
            # that crashes the worker (round-5 probes: donated AND
            # undonated), while scatters in loop bodies lower to the
            # reliable copying form (the fused chunked scan survives
            # repeatedly). Same math; one table copy per DISPATCH —
            # the cost the working set exists to amortize.
            def store(carry, _):
                tab_e, tab_r, acc = carry
                tab_e = scatter_rows_add(tab_e, u_e, w_e - w_e0)
                tab_r = scatter_rows_add(tab_r, u_r, w_r - w_r0)
                if adagrad:
                    acc = {
                        e_path: {"sum": scatter_rows_add(
                            acc[e_path]["sum"], u_e, a_e - a_e0
                        )},
                        r_path: {"sum": scatter_rows_add(
                            acc[r_path]["sum"], u_r, a_r - a_r0
                        )},
                    }
                return (tab_e, tab_r, acc), jnp.zeros(())

            acc0 = opt_state["sparse"] if adagrad else {}
            (new_tab_e, new_tab_r, new_acc), _ = jax.lax.scan(
                store,
                (params["entity_embedder"]["weights"],
                 params["relation_embedder"]["weights"], acc0),
                jnp.arange(1, dtype=jnp.int32),
            )
            params = {
                **params,
                "entity_embedder": {
                    **params["entity_embedder"], "weights": new_tab_e
                },
                "relation_embedder": {
                    **params["relation_embedder"], "weights": new_tab_r
                },
            }
            if adagrad:
                opt_state = {**opt_state, "sparse": dict(new_acc)}
            return params, opt_state, model_state, metrics

        # NOT donated: with donated tables XLA performs the final delta
        # scatter IN PLACE (the gather at program start is the only
        # other consumer), which is the exact write pattern that crashes
        # the current v5e worker (re-confirmed in round 5 — even for
        # sub-limit chunk buffers inside the real program). Undonated
        # inputs force the reliable copying scatter; the copy runs once
        # per DISPATCH and is the cost the working set amortizes.
        return jax.jit(many)

    def _use_group_rowset(self) -> bool:
        """Whether grouped sparse dispatches run the row-working-set
        program (see _build_group_step). auto == never on the current
        runtime (the program crashes the v5e worker at scale); always
        forces it (CPU trajectory tests; future runtimes)."""
        if (not self._sparse_paths or self._sparse_split
                or self._sparse_pipeline):
            return False
        mode = self.config.check(
            "tpu.sparse_group_rowset", ["auto", "always", "never"]
        )
        return mode == "always"

    def _steps_per_dispatch(self) -> int:
        if self._sparse_host_loop_only():
            return 1
        group = super()._steps_per_dispatch()
        if group > 1 and self._table_chunks and self._use_group_rowset():
            # the row working set pays one whole-table delta scatter
            # per dispatch (copying regime, ~17 ms at w5m scale); a
            # deeper group amortizes it — the scanned steps themselves
            # are O(touched rows)
            group = max(group, 16)
        return group

    def _build_pipelined_gather_step(self):
        """ONE compiled program per step, ordered so the big tables are
        updated IN PLACE: scatter batch i-1's pending row updates first
        (the donated tables' first and only pre-update consumer), then
        gather batch i's rows from the updated tables, then loss/grads
        over those rows. The plain fused order (gather -> loss ->
        scatter) makes XLA materialize whole-table operand copies
        (~17 ms/step flat at Wikidata5M scale, batch-size independent);
        this order measured in-place (see docs/STATUS.md round 4).

        The last batch's update is applied by ``step.flush_pipeline``
        (train.py calls it after the batch loop) by re-running the SAME
        program with the last batch as a dummy (its loss/grads are
        discarded) — no separate scatter-only program, so no second
        crash surface on the backend that faults small donated
        big-buffer programs. Sparse-eligible models carry no mutable
        model state (GNN/BN models are excluded from the sparse path),
        so the dummy forward cannot perturb anything retained.

        Semantics match the plain fused step exactly: batch i's loss
        sees all updates < i."""
        import jax

        donate = bool(self.config.get("tpu.donate_buffers"))

        def strip_tables(params):
            return {
                k: (
                    {kk: vv for kk, vv in v.items() if kk != "weights"}
                    if k in ("entity_embedder", "relation_embedder")
                    else v
                )
                for k, v in params.items()
            }

        apply_phase = self._sparse_update_fn(gather_next=False)

        def gather_loss(params, model_state, batch, rng):
            from kge_tpu.train.chunking import gather_rows

            rows_e = gather_rows(
                params["entity_embedder"]["weights"], batch["uniq_e"]
            )
            rows_r = gather_rows(
                params["relation_embedder"]["weights"], batch["uniq_r"]
            )
            return self._sparse_loss_grads(
                rows_e, rows_r, strip_tables(params), model_state, batch,
                rng,
            )

        def pstep(params, opt_state, model_state, p_ue, p_ur, p_grads,
                  batch, lrs, rng):
            params, opt_state = apply_phase(
                params, opt_state, p_ue, p_ur, p_grads, lrs
            )
            grads, new_model_state, metrics = gather_loss(
                params, model_state, batch, rng
            )
            return params, opt_state, new_model_state, grads, metrics

        def fstep(params, opt_state, model_state, batch, lrs, rng):
            # first batch of an epoch: nothing pending to scatter
            grads, new_model_state, metrics = gather_loss(
                params, model_state, batch, rng
            )
            return params, opt_state, new_model_state, grads, metrics

        pstep_j = jax.jit(pstep, donate_argnums=(0, 1) if donate else ())
        fstep_j = jax.jit(fstep)
        self.config.log(
            "Row-sparse updates run as a pipelined-gather single program "
            "(entity table over tpu.sparse_scatter_limit_bytes): "
            "scatter-then-gather order keeps the donated tables in place."
        )
        pending = {}

        def step(params, opt_state, model_state, batch, lrs, rng):
            if "g" in pending:
                p_ue, p_ur, p_g = pending.pop("g")
                params, opt_state, model_state, grads, metrics = pstep_j(
                    params, opt_state, model_state, p_ue, p_ur, p_g,
                    batch, lrs, rng,
                )
            else:
                params, opt_state, model_state, grads, metrics = fstep_j(
                    params, opt_state, model_state, batch, lrs, rng
                )
            pending["g"] = (batch["uniq_e"], batch["uniq_r"], grads)
            pending["last_batch"] = batch
            return params, opt_state, model_state, metrics

        def flush_pipeline(params, opt_state, lrs):
            if "g" in pending:
                p_ue, p_ur, p_g = pending.pop("g")
                batch = pending.pop("last_batch")
                params, opt_state, _, _, _ = pstep_j(
                    params, opt_state, self.model_state, p_ue, p_ur, p_g,
                    batch, lrs, jax.random.PRNGKey(0),
                )
            return params, opt_state

        step.flush_pipeline = flush_pipeline
        step.pipeline_phases = {"pstep": pstep_j, "fstep": fstep_j}
        return step

    def _sparse_host_loop_only(self) -> bool:
        """True when train steps must dispatch one at a time instead of
        scanning k into one compiled program: a lax.scan CARRIES the
        tables, which turns the row scatters into in-place updates of
        the multi-GiB buffers inside a large program — exactly the
        current v5e runtime's crash profile (docs/STATUS.md round 4;
        this is also what the round-3 '>1 GiB fused scatter fault'
        actually was). Per-dispatch steps keep XLA's copying scatters,
        which run reliably. Small tables (under the scatter limit, e.g.
        per-shard under a mesh) scan fine."""
        if not self._sparse_paths:
            return False
        if self._sparse_split or self._sparse_pipeline:
            return True  # host-side pending state between steps
        from kge_tpu.train.chunking import chunk_rows

        shards = self.mesh.shape["model"] if self.mesh else 1
        limit = int(self.config.get("tpu.sparse_scatter_limit_bytes"))
        per_buffer = []
        for path, emb in (
            ("entity_embedder.weights", self.model.get_s_embedder()),
            ("relation_embedder.weights", self.model.get_p_embedder()),
        ):
            rows = emb.padded_vocab_size
            k = self._table_chunks.get(path, 1)
            if k > 1:
                rows = chunk_rows(rows, k)
            per_buffer.append(rows * emb.dim * 4 // shards)
        return max(per_buffer) > limit

    def _prepare(self):
        self._implementation = self.config.check(
            "negative_sampling.implementation",
            ["triple", "all", "batch", "auto"],
        )
        if self._implementation == "auto":
            # reference heuristic (train_negative_sampling.py:33-46)
            max_negs = int(max(self._sampler.num_samples))
            if self._sampler.shared:
                self._implementation = "batch"
            elif max_negs <= 30:
                self._implementation = "triple"
            else:
                self._implementation = "batch"
            self.config.set(
                "negative_sampling.implementation", self._implementation,
                log=True,
            )
        self.config.log(
            f"Preparing negative sampling with '{self._implementation}' "
            "scoring..."
        )
        self._fused_slots = self._resolve_fused_loss_slots()
        self.graph_sampling = self.config.check(
            "negative_sampling.graph_sampling",
            ["uniform", "edge_neighbourhood", "None"],
        )
        if self.graph_sampling == "None":
            self.graph_sampling = None
        self.graph_sampling_size = self.config.get(
            "negative_sampling.graph_sampling_size"
        )
        if self.graph_sampling:
            self.num_examples = self.graph_sampling_size
        else:
            self.num_examples = len(self.dataset.split(self.train_split))
        self._device_pool = None
        self._on_device_sampling = self._resolve_on_device_sampling()

    def _sample_graph(self, rng: np.random.Generator) -> np.ndarray:
        """Per-epoch subgraph sampling; returns the sampled triples and
        updates the GNN encoder's edge buffers if the model has one.
        ``rng`` is the epoch-derived generator (``_epoch_np_rng``), so a
        resumed run redraws the same subgraph for epoch k as the
        uninterrupted run (the reference re-derives its sampled indexes
        per epoch the same way, train_negative_sampling.py:53-64)."""
        from kge_tpu.train.graph_util import (
            sample_edge_neighbourhood, sample_uniform
        )

        train = self.dataset.split(self.train_split)
        if self.graph_sampling == "uniform":
            triples = sample_uniform(
                train, self.graph_sampling_size, rng
            )
        else:
            triples = sample_edge_neighbourhood(
                train, self.graph_sampling_size, rng
            )
        if hasattr(self.model, "set_graph"):
            self.model.set_graph(triples)
            self._train_step = None  # edge buffers changed shape
        return triples

    # ------------------------------------------------------------------ on-device sampling

    def _resolve_on_device_sampling(self) -> bool:
        """Draw the shared negatives INSIDE the jitted step instead of
        on the host (``tpu.on_device_sampling``). The epoch loop then
        ships only [B] positive triple indices per batch — on remote-
        attached devices the per-group payload drops below the
        transport's fast-path threshold, making the loop device-bound.
        Applicable to uniform shared sampling on the fused-loss path
        (the regime of the reference's large-scale recipes)."""
        mode = self.config.check(
            "tpu.on_device_sampling", ["auto", "always", "never"]
        )
        if mode == "never":
            return False
        reasons = []
        active = tuple(s for s in SLOTS if self._sampler.num_samples[s] > 0)
        if not active:
            reasons.append("no negative-sample slots are active")
        if not self._sampler.shared:
            reasons.append("negatives are not shared")
        if type(self._sampler) is not KgeUniformSampler:
            reasons.append("sampler is not uniform")
        missing = [SLOT_STR[s] for s in active if s not in self._fused_slots]
        if missing:
            reasons.append(
                f"slot(s) {', '.join(missing)} are not on the fused loss "
                "path (see tpu.fused_negsamp_loss)"
            )
        if self._sparse_paths:
            reasons.append("row-sparse updates uniquify realized negatives "
                           "on the host")
        if self.graph_sampling:
            reasons.append("graph sampling re-derives the triple pool "
                           "per epoch")
        for slot in active:
            num = int(self._sampler.num_samples[slot])
            voc = int(self._sampler.vocabulary_size[slot])
            if voc < num + 1:
                reasons.append(
                    f"vocabulary of slot {SLOT_STR[slot]} ({voc}) is "
                    f"smaller than num_samples+1 ({num + 1})"
                )
        if reasons:
            if mode == "always":
                raise ValueError(
                    "tpu.on_device_sampling=always is not applicable here: "
                    + "; ".join(reasons)
                )
            return False
        self.config.log(
            "Sampling negatives on device (host ships positive indices "
            "only)."
        )
        return True

    def _expand_device_batch(self, batch, rng):
        if "pos_idx" not in batch:
            return batch
        import jax

        from kge_tpu.train.sampler import device_shared_sample

        pos_idx = batch["pos_idx"]
        triples = jnp.take(self._device_pool, pos_idx, axis=0)
        bsz = pos_idx.shape[0]
        # tail padding is always a suffix, so weights derive from the
        # true size instead of riding the payload
        weights = (
            jnp.arange(bsz, dtype=jnp.float32) < batch["size"]
        ).astype(jnp.float32)
        out = {"triples": triples, "weights": weights, "size": batch["size"]}
        # disjoint fold constants: subbatches use 0..len(slices)-1, the
        # penalty term 7919 (train.py _make_step_fn)
        skey = jax.random.fold_in(rng, 104729)
        naive = self._sampler.shared_type == "naive"
        wr = bool(self._sampler.with_replacement)
        for slot in SLOTS:
            num = int(self._sampler.num_samples[slot])
            if num <= 0:
                continue
            unique, base, nu, drop = device_shared_sample(
                jax.random.fold_in(skey, slot), num,
                int(self._sampler.vocabulary_size[slot]), naive, wr,
                triples[:, slot],
            )
            key = SLOT_STR[slot]
            out[f"neg_unique_{key}"] = unique
            out[f"neg_base_{key}"] = base
            out[f"neg_nu_{key}"] = nu
            if drop is not None:
                out[f"neg_drop_{key}"] = drop
        return out

    def _on_device_epoch_order(self, epoch: int) -> np.ndarray:
        """The epoch's shuffled positive-index order for on-device
        sampling, with the device triple pool staged. Draws the SAME
        RNG sequence as the host-collate path in _generate_batches, so
        the device-resident and per-batch loops are trajectory-equal
        (graph sampling never combines with on-device sampling — see
        _resolve_on_device_sampling)."""
        rng = self._epoch_np_rng(epoch)
        if self._np_seed >= 0:
            self._sampler.seed((self._np_seed + 1, epoch))
        triples_pool = self.dataset.split(self.train_split)
        if self._device_pool is None:
            import jax

            self._device_pool = jax.device_put(
                triples_pool.astype(np.int32), self.device
            )
        return rng.permutation(len(triples_pool))[: self.num_examples]

    def _epoch_device_payload(self, epoch: int):
        """Whole-epoch payload for device-resident grouped dispatch
        (train.py _build_epoch_group_step): on-device sampling needs
        only [M, B] positive indices and [M] true sizes on device — the
        host then ships one scalar per dispatch instead of collating
        every batch."""
        if not self._on_device_sampling:
            return None
        idxs, sizes = [], []
        for idx, _, true in self._pad_batch_indexes(
            self._on_device_epoch_order(epoch)
        ):
            idxs.append(idx.astype(np.int32))
            sizes.append(true)
        return {
            "pos_idx": np.stack(idxs),
            "size": np.asarray(sizes, dtype=np.float32),
        }

    def _generate_batches(self, epoch: int):
        if self._on_device_sampling:
            for idx, _, true in self._pad_batch_indexes(
                self._on_device_epoch_order(epoch)
            ):
                yield {"pos_idx": idx.astype(np.int32),
                       "size": np.float32(true)}
            return
        rng = self._epoch_np_rng(epoch)
        if self._np_seed >= 0:
            # negatives re-derive per epoch too (see _epoch_np_rng):
            # resume at epoch k draws the same corruptions as the
            # uninterrupted run
            self._sampler.seed((self._np_seed + 1, epoch))
        if self.graph_sampling:
            triples_pool = self._sample_graph(rng)
        else:
            triples_pool = self.dataset.split(self.train_split)
        order = rng.permutation(len(triples_pool))[: self.num_examples]
        for idx, weights, true in self._pad_batch_indexes(order):
            triples = triples_pool[idx].astype(np.int32)
            batch: Dict[str, np.ndarray] = {
                "triples": triples,
                "weights": weights,
                "size": np.float32(true),
            }
            for slot in SLOTS:
                if self._sampler.num_samples[slot] <= 0:
                    continue
                ns = self._sampler.sample(triples, slot)
                key = SLOT_STR[slot]
                if ns.shared:
                    batch[f"neg_unique_{key}"] = ns.unique
                    if slot in self._fused_slots:
                        # the fused kernel consumes candidate
                        # multiplicities; ship only their FACTORS (the
                        # [num+1] base vector and the per-row dropped
                        # position) and expand on device with vector
                        # ops — the [B, num+1] matrix would dominate
                        # the per-batch host->device payload
                        base, drop = ns.count_factors()
                        batch[f"neg_base_{key}"] = base
                        batch[f"neg_nu_{key}"] = np.int32(ns.num_unique)
                        if drop is not None:
                            batch[f"neg_drop_{key}"] = drop.astype(np.int32)
                    else:
                        batch[f"neg_gather_{key}"] = ns.gather
                else:
                    batch[f"negatives_{key}"] = ns.materialize()
            if self._sparse_paths:
                self._add_row_index_payload(batch)
            yield batch

    def _add_row_index_payload(self, batch: Dict[str, np.ndarray]):
        """Host-side uniquify + remap for row-sparse updates: ship sorted
        unique id vectors and remapped indices so the compiled step does
        only gathers and scatters (device-side unique/searchsorted cost
        more than the whole sparse saving at small vocabularies)."""
        e_pad = self.model.get_s_embedder().padded_vocab_size
        r_pad = self.model.get_p_embedder().padded_vocab_size
        ent_rows, rel_rows = self._touched_row_counts()
        u_e, u_r = min(ent_rows, e_pad), min(rel_rows, r_pad)
        triples = batch["triples"]
        ent_parts = [triples[:, S], triples[:, O]]
        rel_parts = [triples[:, P]]
        for slot in SLOTS:
            if self._sampler.num_samples[slot] <= 0:
                continue
            key = SLOT_STR[slot]
            arr = batch.get(f"neg_unique_{key}",
                            batch.get(f"negatives_{key}"))
            (rel_parts if slot == P else ent_parts).append(arr.reshape(-1))

        def uniquify(parts, size, vocab_pad):
            """Sorted id vector of exactly ``size`` DISTINCT in-range
            ids: the batch's real unique ids plus fill ids drawn from
            the top of the (padded) vocabulary, skipping real ids. Fill
            rows are never referenced by the remapped batch, so their
            gradients are exactly zero and the row update adds 0 to
            them — harmless even when they are real entities. Distinct
            (rather than repeated) fill ids matter on TPU: a sorted
            scatter with a long duplicate run inside the fused train
            program faults the current v5e runtime (docs/STATUS.md
            round 4), and the in-place Pallas row kernel's revisit
            logic also becomes trivially safe without duplicate
            blocks."""
            uniq = np.unique(np.concatenate(parts))
            if len(uniq) > size:
                raise AssertionError(
                    f"touched-row bound {size} below actual {len(uniq)} "
                    "(bug in _touched_row_counts)"
                )
            if len(uniq) < size:
                n = size - len(uniq)
                window = np.arange(max(vocab_pad - size - n, 0),
                                   vocab_pad, dtype=uniq.dtype)
                fill = np.setdiff1d(window, uniq)[-n:]
                uniq = np.sort(np.concatenate([uniq, fill]))
            return uniq.astype(np.int32)

        uniq_e = uniquify(ent_parts, u_e, e_pad)
        uniq_r = uniquify(rel_parts, u_r, r_pad)
        # uniq is strictly unique (distinct fill ids above), so every
        # equal run has length 1 and side='left' and side='right'-1
        # agree; the 'right' form is kept as defense in depth — if
        # duplicates ever reappear, the real gradient lands on the
        # run's FINAL position, which keeps the in-place Pallas row
        # kernel (whose earlier duplicate steps may write back stale
        # pre-update rows under DMA pipelining) correct by
        # construction. XLA's scatter-add is position-agnostic across
        # equal ids either way.
        remap_e = lambda a: (
            np.searchsorted(uniq_e, a, side="right") - 1
        ).astype(np.int32)
        remap_r = lambda a: (
            np.searchsorted(uniq_r, a, side="right") - 1
        ).astype(np.int32)
        batch["triples"] = np.stack(
            [remap_e(triples[:, S]), remap_r(triples[:, P]),
             remap_e(triples[:, O])], axis=1,
        )
        for slot in SLOTS:
            if self._sampler.num_samples[slot] <= 0:
                continue
            key = SLOT_STR[slot]
            remap = remap_r if slot == P else remap_e
            if f"neg_unique_{key}" in batch:
                batch[f"neg_unique_{key}"] = remap(batch[f"neg_unique_{key}"])
            else:
                batch[f"negatives_{key}"] = remap(batch[f"negatives_{key}"])
        batch["uniq_e"] = uniq_e
        batch["uniq_r"] = uniq_r

    # ------------------------------------------------------------------ fused loss

    def _resolve_fused_loss_slots(self):
        """Slots routed through the fused Pallas score+CE kernel (one
        call replaces the matmul / row-gather / concat / log-softmax
        kernel chain of the latency-bound step; ops/pallas/
        negsamp_loss.py)."""
        mode = self.config.check(
            "tpu.fused_negsamp_loss", ["auto", "always", "never"]
        )
        if mode == "never":
            return ()
        import jax

        m = self.model
        reasons = []
        if not self._sampler.shared:
            reasons.append("negatives are not shared")
        if self._implementation != "batch":
            reasons.append(
                f"implementation '{self._implementation}' is not 'batch'"
            )
        if self.config.get("train.loss") != "kl":
            reasons.append("train.loss is not kl (the kernel fuses the "
                           "log-softmax cross entropy)")
        if not (hasattr(m, "supports_dot_ranking")
                and m.supports_dot_ranking()):
            reasons.append("model has no dot form")
        elif getattr(m, "dot_score_space", lambda: "native")() != "native":
            reasons.append("dot form is a monotone transform, not the "
                           "native score")
        if mode == "auto" and jax.default_backend() == "cpu":
            reasons.append("CPU backend (interpret mode is slower than XLA)")
        if reasons:
            if mode == "always":
                raise ValueError(
                    "tpu.fused_negsamp_loss=always is not applicable here: "
                    + "; ".join(reasons)
                )
            return ()
        slots = tuple(
            s for s in (S, O) if self._sampler.num_samples[s] > 0
        )
        if slots:
            self.config.log(
                "Using the fused shared-negative loss kernel for slots "
                + ", ".join(SLOT_STR[s] for s in slots)
            )
        return slots

    def _fused_loss(self, params, ctx: Ctx, triples, weights, batch, sl,
                    slots) -> jnp.ndarray:
        import jax
        from kge_tpu.ops.pallas.negsamp_loss import (
            shared_ce_loss, shared_ce_loss_sharded,
        )

        interpret = jax.default_backend() == "cpu"
        mesh = self.mesh
        s, p, o = triples[:, 0], triples[:, 1], triples[:, 2]
        q_sp, q_po = self.model.dot_queries(params, s, p, o, ctx=ctx)
        total = 0.0
        for slot in slots:
            key = SLOT_STR[slot]
            unique = batch[f"neg_unique_{key}"]        # [num+1]
            # multiplicity of each unique candidate in the row's sample:
            # the count form selects exactly the multiset the reference's
            # per-row gather selects (with-replacement draws + drop
            # trick); expanded here from the shipped factors (base
            # multiplicities + per-row dropped position) — fused into
            # the surrounding ops by XLA, no scatter. KEEP IN LOCKSTEP
            # with BatchNegativeSample.counts() (the numpy form)
            num1 = batch[f"neg_base_{key}"].shape[-1]
            base = batch[f"neg_base_{key}"]            # [num+1]
            nu = batch[f"neg_nu_{key}"]                # scalar int32
            rows = triples.shape[0]
            if f"neg_drop_{key}" in batch:
                drop = batch[f"neg_drop_{key}"][sl]    # [rows]
                cols = jnp.arange(num1, dtype=jnp.int32)
                extra = jnp.where(
                    drop < nu, jnp.take(base, drop, mode="clip"), 0.0
                )
                counts = base[None, :] * (cols[None, :] != drop[:, None])
                counts = jnp.where(
                    cols[None, :] == nu, extra[:, None], counts
                )
            else:  # naive sharing: every row sees the same multiset
                counts = jnp.broadcast_to(base, (rows, num1))
            if slot == O:
                q = q_sp
                cand, _ = self.model.dot_candidates(
                    params, unique, ctx=ctx, sides=("sp",)
                )
                pos_cand, _ = self.model.dot_candidates(
                    params, o, ctx=ctx, sides=("sp",)
                )
            else:
                q = q_po
                _, cand = self.model.dot_candidates(
                    params, unique, ctx=ctx, sides=("po",)
                )
                _, pos_cand = self.model.dot_candidates(
                    params, s, ctx=ctx, sides=("po",)
                )
            pos = jnp.sum(q * pos_cand, axis=1)
            if mesh is not None:
                total = total + shared_ce_loss_sharded(
                    q, cand, pos, counts, weights, mesh, interpret
                )
            else:
                total = total + shared_ce_loss(
                    q, cand, pos, counts, weights, interpret
                )
        return total

    # ------------------------------------------------------------------ scoring

    def _negative_scores(self, params, ctx: Ctx, triples, batch, sl,
                         slot: int) -> jnp.ndarray:
        """[rows, num_samples] scores of the sampled corruptions."""
        key = SLOT_STR[slot]
        s, p, o = triples[:, 0], triples[:, 1], triples[:, 2]
        shared = f"neg_unique_{key}" in batch

        if shared:
            unique = batch[f"neg_unique_{key}"]     # [num+1]
            gather = batch[f"neg_gather_{key}"][sl]  # [rows, num]
            if slot == S:
                all_scores = self.model.score_po(params, p, o, s_subset=unique,
                                                 ctx=ctx)
            elif slot == O:
                all_scores = self.model.score_sp(params, s, p, o_subset=unique,
                                                 ctx=ctx)
            else:
                all_scores = self.model.score_so(params, s, o, p_subset=unique,
                                                 ctx=ctx)
            return row_gather(all_scores, gather)

        negatives = batch[f"negatives_{key}"][sl]    # [rows, num]
        rows, num = negatives.shape
        if self._implementation == "triple":
            rep = lambda x: jnp.repeat(x, num)
            flat = negatives.reshape(-1)
            if slot == S:
                scores = self.model.score_spo(
                    params, flat, rep(p), rep(o), direction="s", ctx=ctx
                )
            elif slot == O:
                scores = self.model.score_spo(
                    params, rep(s), rep(p), flat, direction="o", ctx=ctx
                )
            else:
                scores = self.model.score_spo(
                    params, rep(s), flat, rep(o), direction="p", ctx=ctx
                )
            return scores.reshape(rows, num)
        if self._implementation == "all":
            if slot == S:
                all_scores = self.model.score_po(params, p, o, ctx=ctx)
            elif slot == O:
                all_scores = self.model.score_sp(params, s, p, ctx=ctx)
            else:
                all_scores = self.model.score_so(params, s, o, ctx=ctx)
            return row_gather(all_scores, negatives)
        # batch: score against the flattened sample set of this subbatch
        flat = negatives.reshape(-1)                 # [rows*num]
        if slot == S:
            all_scores = self.model.score_po(params, p, o, s_subset=flat,
                                             ctx=ctx)
        elif slot == O:
            all_scores = self.model.score_sp(params, s, p, o_subset=flat,
                                             ctx=ctx)
        else:
            all_scores = self.model.score_so(params, s, o, p_subset=flat,
                                             ctx=ctx)
        cols = (
            jnp.arange(rows)[:, None] * num + jnp.arange(num)[None, :]
        )
        return row_gather(all_scores, cols)

    def _subbatch_loss(self, params, ctx: Ctx, batch, sl):
        triples = batch["triples"][sl]
        weights = batch["weights"][sl]
        size = batch["size"]
        total = 0.0
        fused = tuple(
            s for s in getattr(self, "_fused_slots", ())
            if f"neg_base_{SLOT_STR[s]}" in batch
        )
        if fused:
            total = total + self._fused_loss(
                params, ctx, triples, weights, batch, sl, fused
            ) / size
        for slot in SLOTS:
            num = int(self._sampler.num_samples[slot])
            if num <= 0 or slot in fused:
                continue
            pos = self.model.score_spo(
                params, triples[:, 0], triples[:, 1], triples[:, 2],
                direction=SLOT_STR[slot], ctx=ctx,
            )
            neg = self._negative_scores(params, ctx, triples, batch, sl, slot)
            scores = jnp.concatenate([pos[:, None], neg], axis=1)
            labels = jnp.zeros(scores.shape[0], dtype=jnp.int32)
            total = total + self.loss(
                scores, labels, row_weights=weights, num_negatives=num
            ) / size
        return total
