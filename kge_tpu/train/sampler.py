"""Negative samplers (host-side numpy, static-shape device payloads).

Capability parity with the reference sampler stack (reference:
kge/util/sampler.py): uniform and frequency sampling, per-slot filtering
with resampling, and shared sampling (naive/default, with the
positive-drop trick).

TPU re-design: sampling stays on the host (it is inherently
data-dependent), but every batch ships to the device as *fixed-shape*
arrays so the compiled train step never re-specializes:

- non-shared: ``negatives`` [B, num] int32
- shared: ``unique`` [num+1] int32 (padded) + ``gather`` [B, num] int32
  column map, so the step scores the unique set once ([B, num+1] matmul)
  and gathers per-row columns — the same trick as the reference's
  shared-batch fast path, in static shapes.

For uniform shared sampling the draw itself is also expressible in
fixed shapes, so it can run *inside the jitted step*
(``device_shared_sample``): the train loop then ships only positive
triple indices per batch (``tpu.on_device_sampling``) — the remote-
attached dispatch payload drops from ~1 MB to ~128 KB per 32-step
group, which is the difference between the slow and the fast transfer
path of the tunnel transport.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from kge_tpu.config import Config, Configurable
from kge_tpu.dataset import Dataset

S, P, O = 0, 1, 2
SLOT_STR = ["s", "p", "o"]
SLOTS = [S, P, O]


class BatchNegativeSample:
    """Fixed-shape negative sample for one slot of a batch.

    Shared samples are stored in factored form — ``unique`` candidates
    plus (``num_unique``, ``repeat_indexes``, ``drop``) — and expand to
    the per-row ``gather`` column map or the per-row candidate
    multiplicity matrix (``counts``, what the fused loss kernel
    consumes) only on demand: both expansions are O(B*num) and sit on
    the host critical path between dispatches, so the one the step
    doesn't use is never built."""

    def __init__(self, slot: int, num_samples: int,
                 negatives: Optional[np.ndarray] = None,
                 unique: Optional[np.ndarray] = None,
                 gather: Optional[np.ndarray] = None,
                 num_unique: Optional[int] = None,
                 repeat_indexes: Optional[np.ndarray] = None,
                 drop: Optional[np.ndarray] = None,
                 batch_size: Optional[int] = None):
        self.slot = slot
        self.num_samples = num_samples
        self._negatives = negatives
        self.unique = unique
        self._gather = gather
        self.num_unique = num_unique
        self.repeat_indexes = repeat_indexes
        self.drop = drop
        self._batch_size = batch_size

    @property
    def shared(self) -> bool:
        return self.unique is not None

    @property
    def gather(self) -> Optional[np.ndarray]:
        """[B, num] column map into ``unique`` (built lazily)."""
        if self._gather is None and self.unique is not None:
            nu = self.num_unique
            if self.drop is None:  # naive: every row sees the same columns
                cols = np.broadcast_to(
                    np.arange(nu, dtype=np.int32), (self._batch_size, nu)
                )
            else:
                # default: the dropped position is replaced by the extra
                # candidate parked at position num_unique
                cols = np.broadcast_to(
                    np.arange(nu, dtype=np.int64), (len(self.drop), nu)
                ).copy()
                cols[cols == self.drop[:, None]] = nu
                cols = cols.astype(np.int32)
            if len(self.repeat_indexes):
                cols = np.concatenate(
                    [cols, cols[:, self.repeat_indexes]], axis=1
                )
            self._gather = cols
        return self._gather

    def count_factors(self):
        """Factored candidate multiplicities: the [num+1] float32 base
        vector (1 + repeat multiplicity per live column, zero at the
        extra/padding positions) and the per-row dropped position (None
        for naive sharing). ``counts()`` expands them; the train step
        ships the factors and expands on device instead."""
        num, nu = self.num_samples, self.num_unique
        base = np.zeros(num + 1, dtype=np.float32)
        base[:nu] = 1.0
        if len(self.repeat_indexes):
            base[:nu] += np.bincount(
                self.repeat_indexes, minlength=nu
            ).astype(np.float32)
        return base, self.drop

    def counts(self) -> np.ndarray:
        """[B, num+1] float32 multiplicity of each unique candidate in
        each row's sample — the closed form of
        ``bincount(row * U + gather)``: every row holds 1 + repeat
        multiplicity per live column, with the dropped column zeroed and
        its mass moved to the extra position. KEEP IN LOCKSTEP with the
        device-side expansion (train_negative_sampling._fused_loss) and
        the test referee (tests/test_pallas.py expand_counts); the
        sampler test pins this form against gather, the fused-loss test
        pins the device form against gather."""
        num, nu = self.num_samples, self.num_unique
        base, drop = self.count_factors()
        if drop is None:
            return np.broadcast_to(base, (self._batch_size, num + 1))
        B = len(drop)
        counts = np.tile(base, (B, 1))
        extra = np.where(
            drop < nu, base[np.minimum(drop, nu - 1)], 0.0
        ).astype(np.float32)
        counts[np.arange(B), drop] = 0.0
        counts[:, nu] = extra
        return counts

    def materialize(self) -> np.ndarray:
        """[B, num] negative indexes (expands the shared representation)."""
        if self._negatives is not None:
            return self._negatives
        return self.unique[self.gather]


def device_shared_sample(key, num: int, voc: int, naive: bool,
                         with_replacement: bool, positives):
    """Uniform shared sampling drawn ON DEVICE, in the exact factored
    form the fused train step consumes: ``(unique[num+1], base[num+1],
    num_unique, drop[B])`` with the same distribution and padding
    conventions as the host path (``KgeUniformSampler._sample_shared``,
    reference semantics kge/util/sampler.py:597-698):

    - with replacement, the number of DISTINCT values in the row's
      sample is drawn first (count of distinct in one WR draw over the
      base vocabulary), then that many uniques;
    - the unique candidates are a uniform ordered sample without
      replacement, realized as top-k over iid uniforms (the rank order
      of iid uniforms is a uniform permutation, so taking the first
      ``take`` of k=num+1 winners is exchangeable-uniform-distinct —
      the same distribution as the host's collision-redraw draw);
    - repeats land uniformly on the live columns (base multiplicities);
    - 'default' sharing drops one uniformly-chosen position per row,
      overridden to the positive's own position when the positive was
      sampled (the reference's positive-drop trick).

    All shapes are static; ``num_unique`` is traced. Requires
    voc >= num + 1. KEEP IN LOCKSTEP with ``_sample_shared`` and
    ``BatchNegativeSample.count_factors``.
    """
    import jax
    import jax.numpy as jnp

    k_nu, k_uni, k_rep, k_drop = jax.random.split(key, 4)
    base_voc = voc if naive else voc - 1
    if with_replacement:
        d = jax.random.randint(k_nu, (num,), 0, base_voc)
        ds = jnp.sort(d)
        nu = (1 + jnp.sum(ds[1:] != ds[:-1])).astype(jnp.int32)
    else:
        nu = jnp.int32(num)
    take = nu if naive else nu + 1
    # int32 keys rather than f32 uniforms: f32 has 2^24 distinct values,
    # so large vocabularies tie often and top_k's index tie-break would
    # bias the boundary slot toward low ids
    r = jax.random.bits(k_uni, (voc,), "uint32").astype(jnp.int32)
    _, top = jax.lax.top_k(r, num + 1)
    top = top.astype(jnp.int32)
    idx = jnp.arange(num + 1, dtype=jnp.int32)
    # host padding convention: positions past ``take`` repeat unique[0]
    unique = jnp.where(idx < take, top, top[0])
    base = (idx < nu).astype(jnp.float32)
    if with_replacement:
        # (num - nu) repeats, each uniform over the live columns; draw a
        # full-size pool and mask (masked adds are zero)
        rep = jax.random.randint(k_rep, (num,), 0, jnp.maximum(nu, 1))
        rep_mask = (jnp.arange(num) < (num - nu)).astype(jnp.float32)
        base = base.at[rep].add(rep_mask)
    drop = None
    if not naive:
        bsz = positives.shape[0]
        drop0 = jax.random.randint(k_drop, (bsz,), 0, nu + 1)
        match = (unique[None, :] == positives[:, None]) & (idx[None, :] < take)
        hit = jnp.any(match, axis=1)
        hit_pos = jnp.argmax(match, axis=1).astype(jnp.int32)
        drop = jnp.where(hit, hit_pos, drop0).astype(jnp.int32)
    return unique, base, nu, drop


class KgeSampler(Configurable):
    def __init__(self, config: Config, configuration_key: str, dataset: Dataset):
        super().__init__(config, configuration_key)
        self.dataset = dataset
        self.num_samples = np.zeros(3, dtype=np.int64)
        self.filter_positives = np.zeros(3, dtype=bool)
        self.vocabulary_size = np.zeros(3, dtype=np.int64)
        self.shared = self.get_option("shared")
        self.shared_type = self.check_option("shared_type", ["naive", "default"])
        self.with_replacement = self.get_option("with_replacement")
        if not self.with_replacement and not self.shared:
            raise ValueError(
                "without-replacement sampling requires shared negative sampling"
            )
        self.filtering_split = config.get("negative_sampling.filtering.split")
        if self.filtering_split == "":
            self.filtering_split = config.get("train.split")
        for slot in SLOTS:
            slot_str = SLOT_STR[slot]
            self.num_samples[slot] = self.get_option(f"num_samples.{slot_str}")
            self.filter_positives[slot] = self.get_option(f"filtering.{slot_str}")
            self.vocabulary_size[slot] = (
                dataset.num_relations() if slot == P else dataset.num_entities()
            )
            if self.filter_positives[slot]:
                pair = ["po", "so", "sp"][slot]
                dataset.index(f"{self.filtering_split}_{pair}_to_{slot_str}")
        if self.filter_positives.any() and self.shared:
            raise ValueError("filtering is incompatible with shared sampling")
        # auto-complete sample counts (-1: copy from S)
        for slot, copy_from in [(S, O), (P, None), (O, S)]:
            if self.num_samples[slot] < 0:
                if copy_from is not None and self.num_samples[copy_from] > 0:
                    self.num_samples[slot] = self.num_samples[copy_from]
                else:
                    self.num_samples[slot] = 0
        self._rng = np.random.default_rng()

    def seed(self, seed) -> None:
        """Reset the sampler's host RNG; accepts any numpy SeedSequence
        entropy (int or tuple — the trainer passes (seed, epoch) so
        negatives re-derive per epoch, resume-stable)."""
        self._rng = np.random.default_rng(seed)

    @staticmethod
    def create(config: Config, configuration_key: str,
               dataset: Dataset) -> "KgeSampler":
        sampling_type = config.get(configuration_key + ".sampling_type")
        if sampling_type == "uniform":
            return KgeUniformSampler(config, configuration_key, dataset)
        if sampling_type == "frequency":
            return KgeFrequencySampler(config, configuration_key, dataset)
        raise ValueError(configuration_key + ".sampling_type")

    @property
    def num_negatives_total(self) -> int:
        return int(self.num_samples.sum())

    # ------------------------------------------------------------------ api

    def sample(self, positive_triples: np.ndarray, slot: int,
               num_samples: Optional[int] = None) -> BatchNegativeSample:
        if num_samples is None:
            num_samples = int(self.num_samples[slot])
        if self.shared:
            return self._sample_shared(positive_triples, slot, num_samples)
        negatives = self._sample(positive_triples, slot, num_samples)
        if self.filter_positives[slot]:
            negatives = self._filter_and_resample(
                negatives, slot, positive_triples
            )
        return BatchNegativeSample(slot, num_samples, negatives=negatives)

    def _sample(self, positive_triples: np.ndarray, slot: int,
                num_samples: int) -> np.ndarray:
        raise NotImplementedError

    def _sample_shared(self, positive_triples: np.ndarray, slot: int,
                       num_samples: int) -> BatchNegativeSample:
        raise NotImplementedError(
            "the selected sampler does not support shared sampling"
        )

    def _filter_and_resample(self, negatives: np.ndarray, slot: int,
                             positive_triples: np.ndarray) -> np.ndarray:
        """Resample entries that are known positives.

        Fully vectorized over the batch (the analogue of the reference's
        numba bulk path, kge/util/sampler.py:700-752): per-row positive
        sets come from one CSR lookup, membership tests run on
        (row, value)-encoded keys against one sorted array, and each
        resample round redraws ALL still-bad positions in a single
        sampler call."""
        pair_str = ["po", "so", "sp"][slot]
        index = self.dataset.index(
            f"{self.filtering_split}_{pair_str}_to_{SLOT_STR[slot]}"
        )
        cols = [[P, O], [S, O], [S, P]][slot]
        pairs = positive_triples[:, cols]
        pos_rows, pos_vals = index.get_all_coords(pairs)
        if len(pos_rows) == 0:
            return negatives
        voc = int(self.vocabulary_size[slot])
        pos_keys = np.sort(pos_rows.astype(np.int64) * voc + pos_vals)

        def is_positive(rows, vals):
            keys = rows.astype(np.int64) * voc + vals
            i = np.minimum(np.searchsorted(pos_keys, keys),
                           len(pos_keys) - 1)
            return pos_keys[i] == keys

        B, K = negatives.shape
        row_of = np.broadcast_to(np.arange(B)[:, None], (B, K))
        bad_i, bad_j = np.nonzero(is_positive(row_of, negatives))
        guard = 0
        while len(bad_i) and guard < 1000:
            fresh = self._sample(
                positive_triples[bad_i], slot, 1
            ).reshape(-1)
            ok = ~is_positive(bad_i, fresh)
            negatives[bad_i[ok], bad_j[ok]] = fresh[ok]
            bad_i, bad_j = bad_i[~ok], bad_j[~ok]
            guard += 1
        if len(bad_i):
            # the (pair, slot) has almost no non-positive candidates; the
            # reference's fast path would spin forever here -- degrade
            # with a visible warning instead
            self.config.log(
                f"WARNING: filtering could not replace {len(bad_i)} "
                f"positive(s) in the negative sample "
                f"(slot {SLOT_STR[slot]}) after 1000 rounds"
            )
        return negatives


class KgeUniformSampler(KgeSampler):
    def _sample(self, positive_triples, slot, num_samples):
        return self._rng.integers(
            self.vocabulary_size[slot],
            size=(len(positive_triples), num_samples),
            dtype=np.int64,
        ).astype(np.int32)

    def _sample_shared(self, positive_triples, slot, num_samples):
        """Shared sampling with the positive-drop trick (reference:
        kge/util/sampler.py:597-698), emitted as unique+gather arrays."""
        batch_size = len(positive_triples)
        voc = int(self.vocabulary_size[slot])
        if self.with_replacement:
            # distribution of #distinct values in a WR sample
            base = voc if self.shared_type == "naive" else voc - 1
            num_unique = len(
                np.unique(self._rng.integers(base, size=num_samples))
            )
        else:
            num_unique = num_samples
        take = num_unique if self.shared_type == "naive" else num_unique + 1
        unique = self._choice_without_replacement(voc, take)
        if num_unique != num_samples:
            repeat_indexes = self._rng.integers(
                num_unique, size=num_samples - num_unique
            )
        else:
            repeat_indexes = np.zeros(0, dtype=np.int64)

        drop = None
        if self.shared_type != "naive":
            positives = positive_triples[:, slot]
            drop = self._rng.integers(num_unique + 1, size=batch_size)
            # rows whose positive is among the unique samples drop exactly it
            pos_in_unique = np.searchsorted(
                np.sort(unique), positives
            )
            order = np.argsort(unique, kind="stable")
            sorted_unique = unique[order]
            hit = (pos_in_unique < len(unique)) & (
                sorted_unique[np.minimum(pos_in_unique, len(unique) - 1)]
                == positives
            )
            drop = np.where(
                hit, order[np.minimum(pos_in_unique, len(unique) - 1)], drop
            )
        # pad unique to the static length num_samples+1
        padded = np.zeros(num_samples + 1, dtype=np.int32)
        padded[: len(unique)] = unique
        if 0 < len(unique) < num_samples + 1:
            padded[len(unique):] = unique[0]
        return BatchNegativeSample(
            slot, num_samples, unique=padded, num_unique=num_unique,
            repeat_indexes=repeat_indexes, drop=drop, batch_size=batch_size,
        )

    def _choice_without_replacement(self, voc: int, take: int) -> np.ndarray:
        """Uniform ordered sample without replacement. np.Generator.choice
        builds an O(voc) partial permutation — at real vocabulary sizes
        that dwarfs the sample itself — so for take << voc draw i.i.d.
        and redraw collisions (first occurrences kept are exchangeable
        uniform-distinct; identical distribution, O(take))."""
        if take * 8 >= voc:
            return self._rng.choice(
                voc, size=take, replace=False
            ).astype(np.int32)
        out = self._rng.integers(voc, size=take)
        while True:
            uniq, first = np.unique(out, return_index=True)
            if len(uniq) == take:
                return out.astype(np.int32)
            dup = np.ones(take, dtype=bool)
            dup[first] = False
            out[dup] = self._rng.integers(voc, size=int(dup.sum()))


class KgeFrequencySampler(KgeSampler):
    """Sample proportionally to smoothed training-data frequency
    (reference: kge/util/sampler.py:755-793)."""

    def __init__(self, config, configuration_key, dataset):
        super().__init__(config, configuration_key, dataset)
        self._cdf = [None, None, None]
        smoothing = self.get_option("frequency.smoothing")
        train = dataset.split(config.get("train.split"))
        for slot in SLOTS:
            counts = np.bincount(
                train[:, slot], minlength=int(self.vocabulary_size[slot])
            ).astype(np.float64) + smoothing
            self._cdf[slot] = np.cumsum(counts / counts.sum())

    def _sample(self, positive_triples, slot, num_samples):
        u = self._rng.random((len(positive_triples), num_samples))
        idx = np.searchsorted(self._cdf[slot], u)
        # the float64 CDF's last entry can land below 1.0, letting
        # searchsorted return vocabulary_size; clamp to the last id
        return np.minimum(idx, self.vocabulary_size[slot] - 1).astype(np.int32)
