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
from kge_tpu.train.sampler import SLOT_STR, SLOTS, KgeSampler, S, P, O
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

    def _sample_graph(self) -> np.ndarray:
        """Per-epoch subgraph sampling; returns the sampled triples and
        updates the GNN encoder's edge buffers if the model has one."""
        from kge_tpu.train.graph_util import (
            sample_edge_neighbourhood, sample_uniform
        )

        train = self.dataset.split(self.train_split)
        if self.graph_sampling == "uniform":
            triples = sample_uniform(
                train, self.graph_sampling_size, self._np_rng
            )
        else:
            triples = sample_edge_neighbourhood(
                train, self.graph_sampling_size, self._np_rng
            )
        if hasattr(self.model, "set_graph"):
            self.model.set_graph(triples)
            self._train_step = None  # edge buffers changed shape
        return triples

    def _generate_batches(self, epoch: int):
        if self.graph_sampling:
            triples_pool = self._sample_graph()
        else:
            triples_pool = self.dataset.split(self.train_split)
        order = self._np_rng.permutation(len(triples_pool))[: self.num_examples]
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
                    batch[f"neg_gather_{key}"] = ns.gather
                else:
                    batch[f"negatives_{key}"] = ns.materialize()
            yield batch

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
        for slot in SLOTS:
            num = int(self._sampler.num_samples[slot])
            if num <= 0:
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
