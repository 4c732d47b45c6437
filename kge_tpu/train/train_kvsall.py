"""KvsAll training: unique queries scored against all candidates with
multi-label targets (reference: kge/job/train_KvsAll.py).

TPU re-design of the ragged label sets: the collate emits label
*coordinates* padded to a power-of-two bucket; the compiled step scatters
them into a dense [B, num_candidates] matrix on device (out-of-bounds
padding rows are dropped by the scatter). Batches are homogeneous in
query type, so each of sp_/_po/s_o compiles its own [B, E]/[B, R] matmul
specialization exactly once.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from kge_tpu.models import Ctx
from kge_tpu.train.job import Job
from kge_tpu.train.train import TrainingJob

QTYPES = ["sp_", "_po", "s_o"]
QTYPE_KEYS = {"sp_": "qtype_sp", "_po": "qtype_po", "s_o": "qtype_so"}
QTYPE_INDEX = {"sp_": "sp_to_o", "_po": "po_to_s", "s_o": "so_to_p"}


def _bucket(n: int) -> int:
    """Round up to a power of two to bound compiled shape count."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


class TrainingJobKvsAll(TrainingJob):
    def __init__(self, config, dataset, parent_job=None, model=None,
                 forward_only=False):
        super().__init__(config, dataset, parent_job, model=model,
                         forward_only=forward_only)
        config.log("Initializing KvsAll training job...")
        self.type_str = "KvsAll"
        self.label_smoothing = config.check_range(
            "KvsAll.label_smoothing", float("-inf"), 1.0, max_inclusive=False
        )
        if self.label_smoothing < 0:
            if config.get("train.auto_correct"):
                config.log(
                    "Setting KvsAll.label_smoothing to 0 "
                    f"(was {self.label_smoothing})."
                )
                self.label_smoothing = 0.0
            else:
                raise ValueError("KvsAll.label_smoothing must be >= 0")
        if self.label_smoothing > 0 and self.label_smoothing <= (
            1.0 / dataset.num_entities()
        ):
            if config.get("train.auto_correct"):
                self.label_smoothing = 1.0 / dataset.num_entities() + 1e-9
                config.log(
                    "Raised KvsAll.label_smoothing to "
                    f"{self.label_smoothing}."
                )
            else:
                raise ValueError(
                    "KvsAll.label_smoothing must exceed 1/num_entities"
                )
        if self.__class__ == TrainingJobKvsAll:
            for f in Job.job_created_hooks:
                f(self)

    def _prepare(self):
        self.query_types = [
            qt for qt in QTYPES
            if self.config.get(f"KvsAll.query_types.{qt}")
        ]
        if not self.query_types:
            raise ValueError("no enabled query types for KvsAll")
        self.indexes = {}
        self.queries = {}
        num = 0
        for qt in self.query_types:
            index = self.dataset.index(
                f"{self.train_split}_{QTYPE_INDEX[qt]}"
            )
            self.indexes[qt] = index
            self.queries[qt] = index.keys
            num += len(index.keys)
        self.num_examples = num

    def _num_candidates(self, qt: str) -> int:
        return (
            self.dataset.num_relations() if qt == "s_o"
            else self.dataset.num_entities()
        )

    def _generate_batches(self, epoch: int):
        # homogeneous-type batches, shuffled across types
        rng = self._epoch_np_rng(epoch)
        batches = []
        for qt in self.query_types:
            order = rng.permutation(len(self.queries[qt]))
            for idx, weights, true in self._pad_batch_indexes(order):
                batches.append((qt, idx, weights, true, None))
        rng.shuffle(batches)
        group = self._steps_per_dispatch()
        if group > 1:
            batches = self._regroup_for_dispatch(batches, group, rng)
        for qt, idx, weights, true, L in batches:
            index = self.indexes[qt]
            queries = self.queries[qt][idx]
            rows, values, counts = index.get_all_coords(
                queries, return_counts=True
            )
            if L is None:
                L = _bucket(int(counts.max()) if len(counts) else 1)
            pad_value = self._num_candidates(qt)  # out-of-bounds -> dropped
            coords = np.full((self.batch_size, L), pad_value, dtype=np.int32)
            # place each query's answers into its row (rows are sorted,
            # so position-within-row has a cumsum closed form)
            col = (
                np.arange(len(values), dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts)
            ) if len(values) else np.zeros(0, dtype=np.int64)
            coords[rows, col] = values
            # padding rows: weight 0 already ensures no loss contribution,
            # but also clear their coords (they duplicate query 0)
            coords[weights == 0.0] = pad_value
            yield {
                "queries": queries.astype(np.int32),
                "label_coords": coords,
                "weights": weights,
                "size": np.float32(true),
                QTYPE_KEYS[qt]: np.zeros(0, dtype=np.int32),
            }

    def _regroup_for_dispatch(self, batches, group, rng):
        """Reorder batches into runs of ``group`` with identical compiled
        structure — same query type AND same label-bucket width — so
        tpu.steps_per_dispatch grouping engages for KvsAll (the epoch
        driver only stacks structurally identical consecutive batches).
        The multiset of batches is unchanged, but the order is
        STRATIFIED by (type, bucket), not a uniform shuffle: up to
        ``group``-1 consecutive batches share a structure. Runs are
        shuffled against each other, so structures still interleave at
        run granularity. The bucket width computed here rides along in
        the batch tuple (the coords build would derive the same value)."""
        keyed: Dict[tuple, List] = {}
        for qt, idx, weights, true, _ in batches:
            counts = self.indexes[qt].counts_for(self.queries[qt][idx])
            L = _bucket(int(counts.max()) if len(counts) else 1)
            keyed.setdefault((qt, L), []).append((qt, idx, weights, true, L))
        runs = []
        for members in keyed.values():
            for i in range(0, len(members), group):
                runs.append(members[i:i + group])
        rng.shuffle(runs)
        return [b for run in runs for b in run]

    def _subbatch_loss(self, params, ctx: Ctx, batch, sl):
        queries = batch["queries"][sl]
        weights = batch["weights"][sl]
        coords = batch["label_coords"][sl]
        size = batch["size"]
        if "qtype_sp" in batch:
            scores = self.model.score_sp(
                params, queries[:, 0], queries[:, 1], ctx=ctx
            )
            smooth = True
        elif "qtype_po" in batch:
            scores = self.model.score_po(
                params, queries[:, 0], queries[:, 1], ctx=ctx
            )
            smooth = True
        else:
            scores = self.model.score_so(
                params, queries[:, 0], queries[:, 1], ctx=ctx
            )
            smooth = False
        rows = scores.shape[0]
        labels = jnp.zeros(scores.shape, dtype=scores.dtype)
        labels = labels.at[
            jnp.arange(rows)[:, None], coords
        ].add(1.0, mode="drop")
        # ^ add, not set: a triple duplicated in the train split weights its
        # label by its multiplicity, matching the reference's uncoalesced
        # sparse label tensor (train_KvsAll.py:242-247 summing duplicate
        # coordinates on densification)
        if self.label_smoothing > 0 and smooth:
            # ConvE-style smoothing over the entity axis; the reference's
            # additive term is literally 1/num_entities, NOT the
            # textbook eps/num_entities (train_KvsAll.py:263-266)
            labels = (
                (1.0 - self.label_smoothing) * labels
                + 1.0 / self.dataset.num_entities()
            )
        return self.loss(scores, labels, row_weights=weights) / size

    def _penalty_batch(self, batch):
        # queries are not triples; penalties use unweighted form
        return {}
