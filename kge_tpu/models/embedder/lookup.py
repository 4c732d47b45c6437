"""Lookup-table embedder: a [vocab, dim] array in the params pytree.

Functional counterpart of the reference lookup embedder (reference:
kge/model/embedder/lookup_embedder.py). The table is the unit of
vocabulary sharding: under a mesh it carries
``NamedSharding(P("model", None))`` and gathers ride the ICI.

Differences by design:
- Lp normalization is a pure param transform (``normalize_params``)
  applied by the training job after each step instead of an in-place hook.
- Frequency-weighted Lp regularization avoids the reference's
  unique+counts (dynamic shapes): summing |emb[idx]|^p over *all* batch
  indexes is mathematically identical and static-shape friendly.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from kge_tpu.models.api import Ctx, KgeEmbedder
from kge_tpu.utils.misc import round_to_points


class LookupEmbedder(KgeEmbedder):
    def __init__(self, config, dataset, configuration_key, vocab_size,
                 init_for_load_only=False):
        super().__init__(
            config, dataset, configuration_key, vocab_size, init_for_load_only
        )
        self.normalize_p: float = self.get_option("normalize.p")
        self.regularize: str = self.check_option("regularize", ["", "lp"])
        round_to = self.get_option("round_dim_to")
        if len(round_to) > 0:
            self.dim = round_to_points(round_to, self.dim)
        # vocab padding so the table divides the mesh "model" axis AND
        # aligns to 8 rows (the Mosaic f32 second-minor tile — the
        # in-place sparse row kernel addresses the table in full 8-row
        # blocks, ops/pallas/row_update.py, and a partial trailing block
        # would be an overhanging aliased write). Padded rows are
        # zero-initialized and sliced off by embed_all. The sparse
        # uniquify fill ids are distinct UNREFERENCED ids (pad rows when
        # padding exists; otherwise real-but-absent top-of-vocab ids) —
        # safe either way because fill rows carry exactly zero gradient.
        try:
            model_axis = max(1, config.get("tpu.mesh.model"))
        except KeyError:
            model_axis = 1
        align = model_axis * 8 // math.gcd(model_axis, 8)
        self.padded_vocab_size = -(-self.vocab_size // align) * align
        try:
            self._lookup_mode = config.get("tpu.embedding_lookup")
        except KeyError:
            self._lookup_mode = "auto"
        try:
            self._compute_dtype = config.check(
                "tpu.compute_dtype", ["float32", "bfloat16"]
            )
        except KeyError:
            self._compute_dtype = "float32"
        self.dropout_rate: float = self.get_option("dropout")
        if self.dropout_rate < 0:
            if config.get("train.auto_correct"):
                config.log(
                    f"Setting {configuration_key}.dropout to 0 "
                    f"(was {self.dropout_rate})."
                )
                self.dropout_rate = 0.0

    # ------------------------------------------------------------------ params

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        weights = self.initialize(rng, (self.vocab_size, self.dim))
        if self.normalize_p > 0:
            weights = self._lp_normalize(weights)
        weights = self._maybe_init_pretrained(weights)
        if self.padded_vocab_size != self.vocab_size:
            pad = jnp.zeros(
                (self.padded_vocab_size - self.vocab_size, self.dim),
                weights.dtype,
            )
            weights = jnp.concatenate([weights, pad], axis=0)
        return {"weights": weights}

    def _maybe_init_pretrained(self, weights: jnp.ndarray) -> jnp.ndarray:
        """Overwrite rows whose external ids appear in a packaged model
        (reference: kge/model/kge_model.py:290-340)."""
        try:
            filename = self.get_option("pretrain.model_filename")
        except KeyError:
            return weights
        if not filename:
            return weights
        from kge_tpu.utils.io import load_checkpoint
        from kge_tpu.models.api import KgeModel
        import numpy as np

        checkpoint = load_checkpoint(filename)
        model, params, _ = KgeModel.create_from(checkpoint)
        obj = "entity" if "entity" in self.configuration_key else "relation"
        if obj == "entity":
            pre_embedder = model.get_s_embedder()
            pre_table = params["entity_embedder"]["weights"]
            self_ids = self.dataset.entity_ids()
            pre_ids = model.dataset.entity_ids()
        else:
            pre_embedder = model.get_p_embedder()
            pre_table = params["relation_embedder"]["weights"]
            self_ids = self.dataset.relation_ids()
            pre_ids = model.dataset.relation_ids()
        del pre_embedder
        pre_lookup = {v: i for i, v in enumerate(pre_ids)}
        self_idx, pre_idx = [], []
        for i, v in enumerate(self_ids):
            j = pre_lookup.get(v)
            if j is not None:
                self_idx.append(i)
                pre_idx.append(j)
        if self.get_option("pretrain.ensure_all") and len(self_idx) != len(self_ids):
            raise ValueError(
                "pretrained model does not cover all ids "
                f"({len(self_idx)}/{len(self_ids)})"
            )
        if not self_idx:
            return weights
        self.config.log(
            f"Initialized {len(self_idx)}/{len(self_ids)} "
            f"{self.configuration_key} rows from {filename}"
        )
        return weights.at[np.asarray(self_idx)].set(
            jnp.asarray(pre_table)[np.asarray(pre_idx)]
        )

    def _lp_normalize(self, weights: jnp.ndarray) -> jnp.ndarray:
        p = self.normalize_p
        norms = jnp.sum(jnp.abs(weights) ** p, axis=-1, keepdims=True) ** (1.0 / p)
        return weights / jnp.maximum(norms, 1e-12)

    def normalize_params(self, params):
        if self.normalize_p > 0:
            return {**params, "weights": self._lp_normalize(params["weights"])}
        return params

    # ------------------------------------------------------------------ embed

    def _cast(self, emb: jnp.ndarray, ctx: Ctx) -> jnp.ndarray:
        # mixed precision: parameters stay f32, the scorer math runs in
        # tpu.compute_dtype during training; evaluation always scores in
        # f32 for exact tie semantics (Ctx.train False)
        if ctx.train and self._compute_dtype == "bfloat16":
            return emb.astype(jnp.bfloat16)
        return emb

    def embed(self, params, indexes, ctx: Ctx) -> jnp.ndarray:
        from kge_tpu.ops.embedding import embedding_lookup

        emb = embedding_lookup(params["weights"], indexes, mode=self._lookup_mode)
        return self._cast(ctx.dropout(emb, self.dropout_rate), ctx)

    def embed_all(self, params, ctx: Ctx, padded: bool = False) -> jnp.ndarray:
        """All embeddings; with ``padded``, the full padded table (its
        length divides the mesh model axis by construction — callers
        shard-mapping over the vocabulary need that divisibility and
        mask the padding rows themselves)."""
        rows = (params["weights"] if padded
                else params["weights"][: self.vocab_size])
        return self._cast(ctx.dropout(rows, self.dropout_rate), ctx)

    # ------------------------------------------------------------------ penalty

    def penalties(self, params, ctx: Ctx, indexes=None,
                  **kwargs) -> List[Tuple[str, jnp.ndarray]]:
        if self.regularize == "" or self.get_option("regularize_weight") == 0.0:
            return []
        p = (
            self.get_option("regularize_args.p")
            if self.has_option("regularize_args.p")
            else 2
        )
        weight = self.get_option("regularize_weight")
        name = f"{self.configuration_key}.L{p}_penalty"
        if not self.get_option("regularize_args.weighted"):
            table = params["weights"][: self.vocab_size]
            norm_p = jnp.sum(jnp.abs(table) ** p)
            return [(name, weight / p * norm_p)]
        if indexes is None:
            raise ValueError("weighted regularization needs batch indexes")
        idx = indexes.reshape(-1)
        rows = jnp.take(params["weights"], idx, axis=0)
        # expectation-rescaled weighted penalty: identical to the
        # reference's unique+counts formulation, summed directly
        value = weight / p * jnp.sum(jnp.abs(rows) ** p) / idx.shape[0]
        return [(name, value)]
