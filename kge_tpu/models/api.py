"""Functional model core: embedders, relational scorers, and KgeModel.

Design (not a port): models are *host objects holding only static
configuration*; every array lives in an explicit params pytree that is
passed through pure functions. This is what lets a whole training step be
one compiled XLA program over a device mesh:

- ``KgeEmbedder.init_params(rng) -> pytree`` and
  ``embed(params, indexes, ctx)`` / ``embed_all(params, ctx)``
- ``RelationalScorer.score_emb(params, s_emb, p_emb, o_emb, combine, ctx)``
  with combine in {spo, sp_, _po, s_o}; the combine dimension is exactly
  the axis that shards over the mesh during ranking
- ``KgeModel`` wires embedders + scorer and exposes the same five scoring
  entry points as the reference public API
  (reference: kge/model/kge_model.py:665-771)

``Ctx`` threads train/eval mode, PRNG, and mutable collections (batch-norm
statistics) through the pure functions, flax-style but dependency-free.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config, Configurable
from kge_tpu.dataset import Dataset
from kge_tpu.models.init import initialize, select_initialize_args
from kge_tpu.utils.misc import init_from

S, P, O = 0, 1, 2


class Ctx:
    """Per-call context: mode, PRNG stream, and mutable state collections.

    ``state`` holds non-trainable arrays (e.g. batch-norm running stats)
    read during the call; layers write updated values into ``updates``.
    The training job merges ``updates`` back into its state after the
    step. A default-constructed Ctx is eval mode with no randomness.
    """

    def __init__(self, train: bool = False, rng: Optional[jax.Array] = None,
                 state: Optional[Dict[str, Any]] = None):
        self.train = train
        self.rng = rng
        self.state = state if state is not None else {}
        self.updates: Dict[str, Any] = {}
        # trace-time memo (e.g. GNN encoder output shared across the
        # score calls of one step — the functional form of the
        # reference's stale-embeddings caching)
        self.cache: Dict[str, Any] = {}

    def take_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("this computation needs a PRNG key in its Ctx")
        self.rng, out = jax.random.split(self.rng)
        return out

    def dropout(self, x: jnp.ndarray, rate: float) -> jnp.ndarray:
        if not self.train or rate <= 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(self.take_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class KgeBase(Configurable):
    """Base for scorers/embedders/models: config access + initializer."""

    def __init__(self, config: Config, dataset: Dataset, configuration_key=None):
        super().__init__(config, configuration_key)
        self.dataset = dataset

    def initialize(self, rng: jax.Array, shape) -> jnp.ndarray:
        name = self.get_option("initialize")
        try:
            raw_args = self.get_option("initialize_args")
        except KeyError:
            raw_args = {}
        args = select_initialize_args(name, raw_args)
        return initialize(rng, shape, name, args)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        return {}

    def init_state(self) -> Dict[str, Any]:
        """Initial non-trainable state (batch-norm stats etc.)."""
        return {}

    def penalties(self, params, ctx: Ctx, **kwargs) -> List[Tuple[str, jnp.ndarray]]:
        """List of (name, scalar) regularization terms, inside jit."""
        return []

    def prepare_job(self, job, **kwargs):
        """Hook registration point before a job runs (reference:
        kge/model/kge_model.py:587-603)."""
        pass


class RelationalScorer(KgeBase):
    """Scores (s,p,o) embedding combinations.

    Subclasses implement ``score_emb`` for the matmul-friendly combines
    and may fall back to the generic cross-product here for the rest.

    Bilinear scorers additionally expose the *dot form*
    (``supports_dot_form = True``): for combine "sp_" (fixed=(s,p)) or
    "_po" (fixed=(p,o)), scores factor as ``query_vec(fixed) @
    candidate_vec(cand).T`` — the contract the fused Pallas rank-count
    evaluation kernel builds on.
    """

    supports_dot_form = False

    #: combines the dot form covers. ConvE/Transformer are sp_-only:
    #: enough for reciprocal-wrapped ranking (both sides rewrite to
    #: sp_), not for a bare model's _po side.
    dot_combines = ("sp_", "_po")

    # "native": q . c equals score_emb exactly (bilinear scorers).
    # "monotone": q . c is a strictly increasing transform of the score
    # (L2 distance scorers via the expansion ||q-c||^2 = ||q||^2 +
    # ||c||^2 - 2 q.c); ranks are preserved, but the fused evaluator
    # must compute true scores through the same dot path so the tie
    # tolerances apply in one consistent score space.
    dot_score_space = "native"

    def query_vec(self, params, a_emb, p_emb, combine: str,
                  ctx: Ctx) -> jnp.ndarray:
        """Query-side vectors: a_emb is s for 'sp_' and o for '_po'."""
        raise NotImplementedError

    def candidate_vec(self, params, cand_emb, combine: str,
                      ctx: Ctx) -> jnp.ndarray:
        """Candidate-side vectors for the free slot of ``combine``."""
        raise NotImplementedError

    def score_emb_spo(self, params, s_emb, p_emb, o_emb, ctx: Ctx) -> jnp.ndarray:
        return self.score_emb(params, s_emb, p_emb, o_emb, "spo", ctx).reshape(-1)

    def score_emb(self, params, s_emb, p_emb, o_emb, combine: str,
                  ctx: Ctx) -> jnp.ndarray:
        raise NotImplementedError

    def _generic_combine(self, params, s_emb, p_emb, o_emb, combine: str,
                         ctx: Ctx) -> jnp.ndarray:
        """Cross-product fallback built from row-wise spo scoring.

        Semantics follow the reference contract
        (kge/model/kge_model.py:151-213): output row i is query i; the
        column axis enumerates the free slot.
        """
        if combine == "sp_":
            n, m = s_emb.shape[0], o_emb.shape[0]
            def score_col(o_j):
                o_rep = jnp.broadcast_to(o_j[None, :], (n, o_j.shape[0]))
                return self.score_emb_spo(params, s_emb, p_emb, o_rep, ctx)
            return jax.vmap(score_col)(o_emb).T  # [n, m]
        if combine == "_po":
            n, m = p_emb.shape[0], s_emb.shape[0]
            def score_col(s_j):
                s_rep = jnp.broadcast_to(s_j[None, :], (n, s_j.shape[0]))
                return self.score_emb_spo(params, s_rep, p_emb, o_emb, ctx)
            return jax.vmap(score_col)(s_emb).T
        if combine == "s_o":
            n, m = s_emb.shape[0], p_emb.shape[0]
            def score_col(p_j):
                p_rep = jnp.broadcast_to(p_j[None, :], (n, p_j.shape[0]))
                return self.score_emb_spo(params, s_emb, p_rep, o_emb, ctx)
            return jax.vmap(score_col)(p_emb).T
        raise ValueError(f"cannot handle combine={combine!r}")


class KgeEmbedder(KgeBase):
    """Maps indexes to embeddings from a params pytree.

    Tables are plain [vocab, dim] arrays — the unit of sharding over the
    mesh "model" axis.
    """

    def __init__(self, config: Config, dataset: Dataset, configuration_key: str,
                 vocab_size: int, init_for_load_only: bool = False):
        super().__init__(config, dataset, configuration_key)
        self.vocab_size = vocab_size
        self.embedder_type = self.get_option("type")
        # per-key overrides resolve through get_default's type indirection
        self.dim: int = self.get_option("dim")

    @staticmethod
    def create(config: Config, dataset: Dataset, configuration_key: str,
               vocab_size: int, init_for_load_only: bool = False) -> "KgeEmbedder":
        try:
            embedder_type = config.get_default(configuration_key + ".type")
        except KeyError as e:
            raise KeyError(
                f"Can't find {configuration_key}.type in config"
            ) from e
        try:
            class_name = config.get(embedder_type + ".class_name")
        except KeyError as e:
            raise KeyError(
                f"Embedder type {embedder_type!r} (from "
                f"{configuration_key}.type) has no {embedder_type}.class_name"
                " — is the component YAML imported?"
            ) from e
        return init_from(
            class_name,
            config.modules(),
            config=config,
            dataset=dataset,
            configuration_key=configuration_key,
            vocab_size=vocab_size,
            init_for_load_only=init_for_load_only,
        )

    def embed(self, params, indexes: jnp.ndarray, ctx: Ctx) -> jnp.ndarray:
        raise NotImplementedError

    def embed_all(self, params, ctx: Ctx) -> jnp.ndarray:
        raise NotImplementedError

    def normalize_params(self, params):
        """Post-step parameter constraint (e.g. Lp normalization)."""
        return params


class KgeModel(KgeBase):
    """A KGE model: entity/relation embedders + relational scorer.

    Public scoring API (identical contract to the reference, with params
    explicit): ``score_spo``, ``score_sp``, ``score_po``, ``score_so``,
    ``score_sp_po``.
    """

    def __init__(self, config: Config, dataset: Dataset, scorer,
                 create_embedders: bool = True, configuration_key=None,
                 init_for_load_only: bool = False):
        super().__init__(config, dataset, configuration_key)
        if isinstance(scorer, type):
            self._scorer: RelationalScorer = scorer(
                config, dataset, self.configuration_key
            )
        else:
            self._scorer = scorer
        if create_embedders:
            self._create_embedders(init_for_load_only)
        else:
            self._entity_embedder = None
            self._relation_embedder = None
        self._base_model: Optional[KgeModel] = None

    def _create_embedders(self, init_for_load_only: bool):
        self._entity_embedder = KgeEmbedder.create(
            self.config, self.dataset,
            self.configuration_key + ".entity_embedder",
            self.dataset.num_entities(), init_for_load_only,
        )
        self._relation_embedder = KgeEmbedder.create(
            self.config, self.dataset,
            self.configuration_key + ".relation_embedder",
            self.dataset.num_relations(), init_for_load_only,
        )

    # ------------------------------------------------------------------ factory

    @staticmethod
    def create(config: Config, dataset: Dataset, configuration_key=None,
               init_for_load_only: bool = False) -> "KgeModel":
        model_name = (
            config.get(configuration_key + ".type")
            if configuration_key
            else config.get("model")
        )
        try:
            class_name = config.get(model_name + ".class_name")
        except KeyError:
            # nested model types (e.g. reciprocal base models, rgnn
            # decoders) may not have been imported yet
            config._import(model_name)
            class_name = config.get(model_name + ".class_name")
        return init_from(
            class_name,
            config.modules(),
            config=config,
            dataset=dataset,
            configuration_key=configuration_key or model_name,
            init_for_load_only=init_for_load_only,
        )

    @staticmethod
    def create_default(model: Optional[str] = None,
                       dataset: Optional[Dataset] = None,
                       options: Optional[Dict] = None,
                       folder: Optional[str] = None) -> "KgeModel":
        config = Config()
        if model is not None:
            config.set("model", model)
        if options:
            config.load_options(options)
        config._import(config.get("model"))
        config.folder = folder
        if dataset is None:
            dataset = Dataset.create(config)
        return KgeModel.create(config, dataset)

    @staticmethod
    def create_from(checkpoint: Dict, dataset: Optional[Dataset] = None,
                    use_tmp_log_folder: bool = True):
        """Rebuild (model, params) from a checkpoint for applications
        (reference: kge/model/kge_model.py:552-585)."""
        import tempfile

        config = Config.create_from(checkpoint)
        if use_tmp_log_folder:
            config.log_folder = tempfile.mkdtemp(prefix="kge-")
        dataset = Dataset.create_from(checkpoint, config, dataset)
        model = KgeModel.create(config, dataset, init_for_load_only=True)
        params = jax.tree_util.tree_map(jnp.asarray, checkpoint["model"]["params"])
        state = jax.tree_util.tree_map(
            jnp.asarray, checkpoint["model"].get("state", {})
        )
        return model, params, state

    # ------------------------------------------------------------------ params

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        r_ent, r_rel, r_sc = jax.random.split(rng, 3)
        return {
            "entity_embedder": self._entity_embedder.init_params(r_ent),
            "relation_embedder": self._relation_embedder.init_params(r_rel),
            "scorer": self._scorer.init_params(r_sc),
        }

    def init_state(self) -> Dict[str, Any]:
        # flat: scorer state keys (e.g. "bn1") address Ctx.state directly
        return self._scorer.init_state()

    def save_to(self, checkpoint: Dict, params, state=None) -> Dict:
        checkpoint["model"] = {
            "params": jax.tree_util.tree_map(np.asarray, params),
            "state": jax.tree_util.tree_map(np.asarray, state or {}),
        }
        return checkpoint

    def normalize_params(self, params):
        params = dict(params)
        params["entity_embedder"] = self.get_s_embedder().normalize_params(
            params["entity_embedder"]
        )
        params["relation_embedder"] = self.get_p_embedder().normalize_params(
            params["relation_embedder"]
        )
        return params

    def prepare_job(self, job, **kwargs):
        """Register the num_parameters trace hook (reference:
        kge/model/kge_model.py:587-603)."""
        super().prepare_job(job, **kwargs)

        from kge_tpu.train.train import TrainingJob

        if isinstance(job, TrainingJob):
            def append_num_parameters(job_):
                if job_.current_trace.get("epoch") is not None:
                    # dechunk first: chunk-tail padding rows would
                    # otherwise inflate the traced count
                    job_.current_trace["epoch"]["num_parameters"] = (
                        self.num_parameters(
                            job_.dechunk_params(job_.params)
                        )
                    )

            job.post_epoch_hooks.append(append_num_parameters)

    def num_parameters(self, params) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))

    # ------------------------------------------------------------------ access

    def get_s_embedder(self) -> KgeEmbedder:
        return self._entity_embedder

    def get_o_embedder(self) -> KgeEmbedder:
        return self._entity_embedder

    def get_p_embedder(self) -> KgeEmbedder:
        return self._relation_embedder

    def get_scorer(self) -> RelationalScorer:
        return self._scorer

    def _split(self, params, which: str):
        return params[which]

    # ------------------------------------------------------------------ penalty

    def penalties(self, params, ctx: Ctx, batch: Optional[Dict] = None,
                  **kwargs) -> List[Tuple[str, jnp.ndarray]]:
        """Regularization terms; with a batch, embedder penalties see the
        batch indexes (for frequency-weighted regularization). Shared s/o
        embedders are intentionally penalized twice (reference:
        kge/model/kge_model.py:605-651)."""
        result = self._scorer.penalties(params["scorer"], ctx, **kwargs)
        ep, rp = params["entity_embedder"], params["relation_embedder"]
        if batch is not None and "triples" in batch:
            triples = batch["triples"]
            result += self.get_p_embedder().penalties(rp, ctx, indexes=triples[:, P])
            if self.get_s_embedder() is self.get_o_embedder():
                so = jnp.stack([triples[:, S], triples[:, O]], axis=1)
                weighted = self.get_s_embedder().get_option("regularize_args.weighted")
                terms = self.get_s_embedder().penalties(
                    ep, ctx, indexes=so if weighted else None
                )
                if not weighted:
                    terms = [(name, 2.0 * value) for name, value in terms]
                result += terms
            else:
                result += self.get_s_embedder().penalties(ep, ctx, indexes=triples[:, S])
                result += self.get_o_embedder().penalties(ep, ctx, indexes=triples[:, O])
        else:
            result += self.get_p_embedder().penalties(rp, ctx)
            terms = self.get_s_embedder().penalties(ep, ctx)
            result += [(name, 2.0 * value) for name, value in terms]
        return result

    # ------------------------------------------------------------------ scoring

    def score_spo(self, params, s, p, o, direction: Optional[str] = None,
                  ctx: Optional[Ctx] = None) -> jnp.ndarray:
        ctx = ctx or Ctx()
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        return self._scorer.score_emb_spo(params["scorer"], s_emb, p_emb, o_emb, ctx)

    def score_sp(self, params, s, p, o_subset=None,
                 ctx: Optional[Ctx] = None) -> jnp.ndarray:
        ctx = ctx or Ctx()
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        if o_subset is not None:
            o_emb = self.get_o_embedder().embed(params["entity_embedder"], o_subset, ctx)
        else:
            o_emb = self.get_o_embedder().embed_all(params["entity_embedder"], ctx)
        return self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, o_emb, "sp_", ctx
        )

    def score_po(self, params, p, o, s_subset=None,
                 ctx: Optional[Ctx] = None) -> jnp.ndarray:
        ctx = ctx or Ctx()
        if s_subset is not None:
            s_emb = self.get_s_embedder().embed(params["entity_embedder"], s_subset, ctx)
        else:
            s_emb = self.get_s_embedder().embed_all(params["entity_embedder"], ctx)
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        return self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, o_emb, "_po", ctx
        )

    def score_so(self, params, s, o, p_subset=None,
                 ctx: Optional[Ctx] = None) -> jnp.ndarray:
        ctx = ctx or Ctx()
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        if p_subset is not None:
            p_emb = self.get_p_embedder().embed(params["relation_embedder"], p_subset, ctx)
        else:
            p_emb = self.get_p_embedder().embed_all(params["relation_embedder"], ctx)
        return self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, o_emb, "s_o", ctx
        )

    # ------------------------------------------------------------------ dot forms

    def supports_dot_ranking(self) -> bool:
        # a bare model ranks both sides natively, so the scorer must
        # provide both dot combines (reciprocal wrapping needs only sp_
        # and overrides this check)
        return self._scorer.supports_dot_form and \
            "_po" in self._scorer.dot_combines

    def dot_score_space(self) -> str:
        """"native" or "monotone" — see RelationalScorer.dot_score_space."""
        return self._scorer.dot_score_space

    def dot_queries(self, params, s, p, o, ctx: Ctx):
        """(q_sp [B, D1], q_po [B, D2]) such that ranking scores factor
        as q @ dot_candidates(ids).T — the fused rank-count contract."""
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        q_sp = self._scorer.query_vec(params["scorer"], s_emb, p_emb, "sp_", ctx)
        q_po = self._scorer.query_vec(params["scorer"], o_emb, p_emb, "_po", ctx)
        return q_sp, q_po

    def dot_candidates(self, params, entity_ids, ctx: Ctx,
                       sides=("sp", "po")):
        """(cand_sp, cand_po) candidate matrices for the given entities;
        sides not requested come back as None (the embed + transform is
        skipped, which halves the work for one-sided callers)."""
        emb = self.get_s_embedder().embed(params["entity_embedder"],
                                          entity_ids, ctx)
        cand_sp = (
            self._scorer.candidate_vec(params["scorer"], emb, "sp_", ctx)
            if "sp" in sides else None
        )
        cand_po = (
            self._scorer.candidate_vec(params["scorer"], emb, "_po", ctx)
            if "po" in sides else None
        )
        return cand_sp, cand_po

    def dot_candidates_all(self, params, ctx: Ctx, padded: bool = False):
        """Candidate matrices over the WHOLE entity vocabulary. For
        identity candidate transforms (DistMult/ComplEx raw rows) this
        is the embedding table itself — no gather, no materialized
        copy — letting the fused rank-count kernel stream it directly.
        ``padded`` keeps the table's padding rows (length then divides
        the mesh model axis; callers mask them invalid)."""
        embedder = self.get_s_embedder()
        try:
            emb = embedder.embed_all(
                params["entity_embedder"], ctx, padded=padded
            )
        except TypeError:  # embedder without a padded variant
            emb = embedder.embed_all(params["entity_embedder"], ctx)
        return (
            self._scorer.candidate_vec(params["scorer"], emb, "sp_", ctx),
            self._scorer.candidate_vec(params["scorer"], emb, "_po", ctx),
        )

    def score_sp_po(self, params, s, p, o, entity_subset=None,
                    ctx: Optional[Ctx] = None) -> jnp.ndarray:
        """[n, 2m]: (s,p,?) scores then (?,p,o) scores over the entity
        subset. This is the evaluation hot path; the entity axis is the
        one sharded over the mesh."""
        ctx = ctx or Ctx()
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx)
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx)
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx)
        if entity_subset is not None:
            all_entities = self.get_s_embedder().embed(
                params["entity_embedder"], entity_subset, ctx
            )
        else:
            all_entities = self.get_s_embedder().embed_all(
                params["entity_embedder"], ctx
            )
        sp_scores = self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, all_entities, "sp_", ctx
        )
        po_scores = self._scorer.score_emb(
            params["scorer"], all_entities, p_emb, o_emb, "_po", ctx
        )
        return jnp.concatenate([sp_scores, po_scores], axis=1)
