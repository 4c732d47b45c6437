"""Relational GNN layers, re-designed for XLA (reference:
kge/model/embedder/rgnn_encoder.py).

TPU-native formulation of the reference's three layer families:

- ``MessagePassingLayer`` (CompGCN/RAGAT style): gather neighbor +
  relation embeddings, compose, transform with a per-mode weight, and
  ``segment_sum`` back to nodes. Edge/self-edge dropout become 0/1 edge
  *masks* folded into the messages (mathematically identical to the
  reference's index slicing, but static-shape); per-relation weights
  (basis/block decompositions) run as a ``lax.scan`` over host-built
  padded relation buckets — one MXU matmul per relation instead of the
  reference's sparse kernels.
- ``RgcnLayer`` (torch-rgcn style): A_r X W_r summed over relations with
  (rel, node)-degree normalization; vertical/horizontal stacking reduces
  to the choice of normalization key.
- ``WeightedGCNLayer`` (W-GCN/SACN): per-relation scalar alpha collapses
  the relational adjacency to one symmetric matrix; one matmul + two
  segment sums.

Batch-norm running statistics live in the Ctx state collections.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from kge_tpu.models.api import Ctx
from kge_tpu.models.init import initialize
from kge_tpu.ops.segment import (
    composition_fn,
    degree_norm,
    schlichtkrull_normal_,
    schlichtkrull_uniform_,
    segment_sum,
    wgcn_uniform_,
)


def init_weight(rng, shape, init_name: str, fans=None):
    """Initializer lookup covering torch.nn.init names plus the RGCN/WGCN
    schemes (reference: rgnn_encoder.py _find_init)."""
    if init_name == "schlichtkrull_normal_":
        return schlichtkrull_normal_(rng, shape, fans=fans)
    if init_name == "schlichtkrull_uniform_":
        return schlichtkrull_uniform_(rng, shape, fans=fans)
    if init_name == "wgcn_uniform_":
        return wgcn_uniform_(rng, shape)
    return initialize(rng, shape, init_name, {})


def batch_norm_affine(x, params, state_key: str, ctx: Ctx,
                      momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm1d with torch semantics, affine scale/bias from params."""
    state = ctx.state[state_key]
    if ctx.train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        ctx.updates[state_key] = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
    x = (x - mean) / jnp.sqrt(var + eps)
    return x * params["bn_scale"] + params["bn_bias"]


class RgnnLayerBase:
    """Shared bits: dims, init names, edge/self-edge dropout masks."""

    def __init__(self, name: str, config, dataset, in_dim: int, out_dim: int,
                 options: Dict[str, Any]):
        self.name = name
        self.config = config
        self.num_entities = dataset.num_entities()
        self.num_base_relations = dataset.num_relations()
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.weight_init = options["weight_init"]
        self.bias_ = options["bias"]
        self.bias_init = options.get("bias_init", "zeros_")
        self.edge_dropout = options["edge_dropout"]
        self.self_edge_dropout = options["self_edge_dropout"]

    def _edge_masks(self, ctx: Ctx, num_edges: int, dtype, edge_orig=None):
        """0/1 keep-masks for edges (correlated across the direct/inverse
        halves, reference: rgnn_encoder.py:504-511) and self-loops.

        edge_orig maps edge positions to original triple ids so the
        per-triple Bernoulli draw stays correlated across the halves even
        when the graph builder reorders edges (destination sorting)."""
        if ctx.train and self.edge_dropout > 0:
            half = jax.random.bernoulli(
                ctx.take_rng(), 1.0 - self.edge_dropout, (num_edges // 2,)
            )
            if edge_orig is not None:
                edge_mask = half[edge_orig].astype(dtype)
            else:
                edge_mask = jnp.concatenate([half, half]).astype(dtype)
        else:
            edge_mask = jnp.ones(num_edges, dtype)
        if ctx.train and self.self_edge_dropout > 0:
            self_mask = jax.random.bernoulli(
                ctx.take_rng(), 1.0 - self.self_edge_dropout,
                (self.num_entities,),
            ).astype(dtype)
        else:
            self_mask = jnp.ones(self.num_entities, dtype)
        return edge_mask, self_mask

    def init_state(self) -> Dict[str, Any]:
        return {}


def _rowblock_gather_sum(xw, scale, nbr, pos, node, trow, tpos, tnode,
                         num_nodes: int):
    """out[v] = sum over v's row-block entries of xw[nbr] * scale[pos],
    with a custom SYMMETRIC backward: d_xw aggregates through the
    TRANSPOSE row blocks (keyed by neighbor) with the same
    accumulated-gather pattern, instead of autodiff's K sequential
    scatter-adds into the full [N, d] cotangent buffer (each a full
    buffer pass).

    Contract: ``scale`` must not require gradients (its cotangent is
    dropped) — callers gate on no learned per-edge weights; masks/norms
    derive from non-differentiable inputs.
    """
    K = nbr.shape[1]

    def gather_acc(table, sc, idx_rows, idx_pos, out_node, n_out):
        acc = jnp.zeros((idx_rows.shape[0], table.shape[1]), table.dtype)
        for k in range(K):
            p = idx_pos[:, k]
            s = jnp.where(p >= 0, jnp.take(sc, jnp.maximum(p, 0)), 0.0)
            acc = acc + jnp.take(table, idx_rows[:, k], axis=0) \
                * s[:, None]
        return segment_sum(acc, out_node, n_out, indices_are_sorted=True)

    @jax.custom_vjp
    def agg(xw, sc):
        return gather_acc(xw, sc, nbr, pos, node, num_nodes)

    def fwd(xw, sc):
        return gather_acc(xw, sc, nbr, pos, node, num_nodes), sc

    def bwd(sc, g):
        # d_acc[row] = g[node[row]]; d_xw[j] = sum of d_acc over the
        # transpose blocks — same kernel shape as the forward
        d_acc = jnp.take(g, node, axis=0)
        d_xw = gather_acc(d_acc, sc, trow, tpos, tnode, g.shape[0])
        return d_xw, jnp.zeros_like(sc)

    agg.defvjp(fwd, bwd)
    return agg(xw, scale)


class MessagePassingLayer(RgnnLayerBase):
    """CompGCN/RAGAT-style layer (reference: rgnn_encoder.py:15-598)."""

    def __init__(self, name, config, dataset, in_dim, out_dim, options,
                 first_layer: bool):
        super().__init__(name, config, dataset, in_dim, out_dim, options)
        self.num_relations = dataset.num_relations() * 2  # with inverses
        mp = options["message_passing_args"]
        self.propagation = mp["propagation"]
        self.message_weight = mp["message_weight"]
        self.learned_relation_weight = mp["learned_relation_weight"]
        self.use_edge_norm = mp["edge_norm"]
        self.prop_dropout = mp["emb_propagation_dropout"]
        self.attention = mp["attention"]
        self.num_heads = mp["num_heads"] if self.attention else 1
        composition = mp["composition"]
        if self.message_weight and not composition.endswith("weighted"):
            composition += "_weighted"
        if composition.endswith("weighted"):
            self.message_weight = True
        self.composition_name = composition
        self.composition = composition_fn(composition)
        # Linear compositions commute with the mode weight:
        # (h_j - h_r) @ W == h_j @ W - h_r @ W, so the matmul hoists out
        # of the per-edge path onto the [N, d] node table (one MXU matmul
        # instead of one per edge) and the per-edge work becomes two
        # gathers. The reference cannot do this (torch_scatter operates
        # on materialized per-edge messages); on TPU it converts the
        # layer from per-edge-matmul-bound to gather/HBM-bound.
        self.hoistable = (
            composition in ("neighbor", "neighbour", "sub")
            and not self.message_weight
        )
        self.rel_transformation = options["rel_transformation"]
        self.weight_decomposition = options["weight_decomposition"]
        self.num_blocks_or_bases = options["num_blocks_or_bases"]
        # relation basis decomposition applies to the first layer only
        if self.weight_decomposition == "relation_basis" and not first_layer:
            self.weight_decomposition = "None"
        if self.weight_decomposition in ("basis", "block"):
            if self.propagation != "per_relation":
                raise RuntimeError(
                    "weight decomposition requires per_relation propagation"
                )
            self.propagation = f"per_relation_{self.weight_decomposition}"
        elif self.propagation == "per_relation":
            # the reference only supports per_relation WITH basis/block
            # decomposition (rgnn_encoder.py:458-460 raises the same way)
            raise NotImplementedError(
                "per_relation propagation requires weight_decomposition "
                "basis or block"
            )
        if self.propagation.startswith("per_relation") and self.message_weight:
            raise NotImplementedError(
                "message_weight is not supported with per_relation "
                "propagation"
            )
        if self.attention:
            self.use_edge_norm = False
        if self.propagation in ("single",):
            self.modes = [""]
            self.self_edge_weight = False
        elif self.propagation == "single_with_self_edge_weight":
            self.modes = ["", "loop"]
            self.self_edge_weight = True
        elif self.propagation == "direction":
            self.modes = ["in", "out", "loop"]
            self.self_edge_weight = True
        elif self.propagation.startswith("per_relation"):
            self.modes = ["per_relation", "loop"]
            self.self_edge_weight = True
        else:
            raise NotImplementedError(
                f"propagation type {self.propagation} not supported"
            )

    # ------------------------------------------------------------------ params

    def init_params(self, rng) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        # sized to the actual draw count (a fixed pool would raise
        # StopIteration for large num_heads x modes configurations)
        n_keys = 8 + self.num_heads * (len(self.modes) + 3)
        keys = iter(jax.random.split(rng, n_keys))
        if self.bias_:
            params["bias"] = init_weight(
                next(keys), (self.out_dim,), self.bias_init
            )
        if not self.propagation.startswith("per_relation"):
            params["bn_scale"] = jnp.ones(self.out_dim)
            params["bn_bias"] = jnp.zeros(self.out_dim)
        params["loop_rel"] = init_weight(
            next(keys), (1, self.in_dim), self.weight_init
        )
        if self.rel_transformation == "linear":
            params["w_rel"] = init_weight(
                next(keys), (self.in_dim, self.out_dim), self.weight_init
            )
        if self.learned_relation_weight:
            params["alpha"] = init_weight(
                next(keys), (self.num_relations + 1, 1), "normal_"
            )
        if self.weight_decomposition == "relation_basis":
            b = self.num_blocks_or_bases
            if b < 1:
                raise ValueError("relation_basis needs >= 1 basis")
            params["basis_vectors"] = init_weight(
                next(keys), (b, self.in_dim), self.weight_init
            )
            params["relation_basis_weights"] = init_weight(
                next(keys), (self.num_relations, b), self.weight_init
            )
        if self.propagation == "per_relation_basis":
            b = self.num_blocks_or_bases
            params["bases"] = init_weight(
                next(keys), (b, self.in_dim, self.out_dim), self.weight_init
            )
            params["comps"] = init_weight(
                next(keys), (self.num_relations, b), self.weight_init
            )
            params["w_loop"] = init_weight(
                next(keys), (self.in_dim, self.out_dim), self.weight_init
            )
        elif self.propagation == "per_relation_block":
            nb = self.num_blocks_or_bases
            bi, ri = divmod(self.in_dim, nb)
            bo, ro = divmod(self.out_dim, nb)
            if ri or ro:
                raise RuntimeError("weight dims not divisible by blocks")
            fans = [self.num_relations // 2, bi]
            params["w_blocks"] = schlichtkrull_normal_(
                next(keys), (self.num_relations, nb, bi, bo), fans=fans
            )
            params["w_loop"] = schlichtkrull_normal_(
                next(keys), (self.in_dim, self.out_dim), fans=fans
            )
        else:
            for head in range(self.num_heads):
                for mode in self.modes:
                    params[f"w_{mode}_h{head}"] = init_weight(
                        next(keys), (self.in_dim, self.out_dim),
                        self.weight_init,
                    )
        for head in range(self.num_heads):
            if self.message_weight:
                params[f"w_msgweight_h{head}"] = init_weight(
                    next(keys), (self.num_relations + 1, self.in_dim),
                    self.weight_init,
                )
            if self.attention:
                params[f"w_att_h{head}"] = init_weight(
                    next(keys), (self.out_dim, 1), self.weight_init
                )
        return params

    def init_state(self):
        if not self.propagation.startswith("per_relation"):
            return {
                f"{self.name}_bn": {
                    "mean": jnp.zeros(self.out_dim),
                    "var": jnp.ones(self.out_dim),
                }
            }
        return {}

    # ------------------------------------------------------------------ forward

    def _edge_messages(self, params, x, r_full, src, nbr, types, mask,
                       weight, head: int, is_loop: bool,
                       norm: Optional[jnp.ndarray], ctx: Ctx) -> jnp.ndarray:
        """Per-edge messages: compose, transform, weight, mask."""
        if self.hoistable:
            # transform node/relation tables once, gather after (see ctor)
            xw = x @ weight
            if is_loop:
                msg = xw
                if self.composition_name == "sub":
                    msg = msg - (r_full[-1] @ weight)[None, :]
            else:
                msg = jnp.take(xw, nbr, axis=0)
                if self.composition_name == "sub":
                    rw = r_full @ weight
                    msg = msg - jnp.take(rw, types, axis=0)
        else:
            h_i = jnp.take(x, src, axis=0)
            h_j = jnp.take(x, nbr, axis=0)
            h_r = jnp.take(r_full, types, axis=0)
            mw = None
            if self.message_weight:
                mw = jnp.take(params[f"w_msgweight_h{head}"], types, axis=0)
            composed = self.composition(h_i, h_j, h_r, mw)
            msg = composed @ weight
        if self.learned_relation_weight and not is_loop:
            msg = msg * jnp.take(params["alpha"], types, axis=0)
        if norm is not None:
            msg = msg * norm[:, None]
        else:
            msg = msg * mask[:, None]
        return msg

    #: above this many [N x R] elements the relation-term count matrix
    #: is not materialized (Wikidata-scale guards)
    C_MATRIX_MAX_ELEMENTS = 64 * 1024 * 1024

    def _row_block_aggregate(self, params, x, r_full, graph, rb_key,
                             scale, weight, head: int,
                             edge_src=None, edge_types=None) -> jnp.ndarray:
        """Materialization-free aggregation over padded-CSR row blocks
        (see encoder._row_blocks): K accumulated gathers + one sorted
        rows->nodes segment_sum. ``scale`` is the per-edge multiplier
        (norm or mask, with alpha folded in by the caller), indexed by
        the rb position arrays.

        For the "sub" composition the relation term is rewritten as ONE
        matmul: out_rel[v] = (sum_e scale_e 1[src=v, type=t]) @ rw =
        C @ rw. Without this, autodiff of take(rw, type) per block
        column re-reads the row-gradient buffer K times (measured ~40%
        of the whole CompGCN train step); the C form's backward is two
        MXU matmuls plus one cheap [E] gather. C builds in-jit (scale is
        traced: dropout/norm/alpha), gated by N*R size."""
        nbr = graph[f"rb_{rb_key}_nbr"]
        types = graph[f"rb_{rb_key}_type"]
        pos = graph[f"rb_{rb_key}_pos"]
        node = graph[f"rb_{rb_key}_node"]
        K = nbr.shape[1]
        N = self.num_entities
        rel_term = None
        if self.hoistable:
            xw = x @ weight
            rw = r_full @ weight if self.composition_name == "sub" else None
            if rw is not None and edge_src is not None and (
                N * rw.shape[0] <= self.C_MATRIX_MAX_ELEMENTS
            ):
                R1 = rw.shape[0]
                flat = edge_src.astype(jnp.int32) * R1 + edge_types
                C = segment_sum(scale, flat, N * R1).reshape(N, R1)
                rel_term = C @ rw
                rw = None  # per-edge subtraction handled at node level
        else:
            h_i = jnp.take(x, node, axis=0)
            mw_table = (params[f"w_msgweight_h{head}"]
                        if self.message_weight else None)
        if (self.hoistable and f"dense_{rb_key}" in graph
                and graph.get("halo_mesh") is None
                and not self.learned_relation_weight
                and (rw is None or rel_term is not None)
                and xw.shape[0] == graph[f"dense_{rb_key}"].shape[1]):
            # dense-adjacency fast path (tpu.gnn_dense_adjacency): the
            # per-edge scale is STATIC (degree norm, all-ones masks —
            # the build gate excludes dropout/alpha), so the K
            # accumulated gathers collapse into one MXU matmul whose
            # [N, N] operand streams at HBM speed instead of paying the
            # DMA-issue-bound row-gather rate (~6 ns/row on the current
            # runtime — benchmarks/probe_gather_layout.py). A is a
            # constant, so autodiff reads the same buffer for d_xw =
            # A^T @ g; summation order differs from the row-block path
            # by ~1e-6 relative at float32.
            A = graph[f"dense_{rb_key}"]
            # bf16 storage upconverts on the fly (the convert fuses into
            # the dot, so HBM traffic stays at the storage dtype)
            out = A.astype(xw.dtype) @ xw
            if rel_term is not None:
                out = out - rel_term
            return out
        if (self.hoistable and graph.get("halo_mesh") is not None
                and f"halo_{rb_key}_nbr" in graph):
            out = self._halo_rowblock(
                graph, rb_key, xw, rw, scale, graph["halo_mesh"]
            )
            if rel_term is not None:
                out = out - rel_term
            return out
        if (self.hoistable and rw is None
                and not self.learned_relation_weight
                and f"rb_{rb_key}_trow" in graph):
            # symmetric-backward fast path (see _rowblock_gather_sum);
            # alpha (learned_relation_weight) would need a scale
            # gradient the custom vjp drops, so it keeps autodiff
            out = _rowblock_gather_sum(
                xw, scale, nbr, pos, node,
                graph[f"rb_{rb_key}_trow"], graph[f"rb_{rb_key}_tpos"],
                graph[f"rb_{rb_key}_tnode"], N,
            )
            if rel_term is not None:
                out = out - rel_term
            return out
        acc = jnp.zeros((node.shape[0], self.out_dim), x.dtype)
        for k in range(K):
            nb, tp, p = nbr[:, k], types[:, k], pos[:, k]
            s = jnp.where(
                p >= 0, jnp.take(scale, jnp.maximum(p, 0)), 0.0
            )
            if self.hoistable:
                m = jnp.take(xw, nb, axis=0)
                if rw is not None:
                    m = m - jnp.take(rw, tp, axis=0)
            else:
                h_j = jnp.take(x, nb, axis=0)
                h_r = jnp.take(r_full, tp, axis=0)
                mw = (jnp.take(mw_table, tp, axis=0)
                      if mw_table is not None else None)
                m = self.composition(h_i, h_j, h_r, mw) @ weight
            acc = acc + m * s[:, None]
        out = segment_sum(acc, node, N, indices_are_sorted=True)
        if rel_term is not None:
            out = out - rel_term
        return out

    def _halo_rowblock(self, graph, rb_key, xw, rw, scale,
                       mesh) -> jnp.ndarray:
        """Edge-partitioned aggregation under a vocab-sharded mesh:
        each shard owns the row blocks of its own entities, exchanges
        ONLY the cross-shard boundary neighbor embeddings (one
        all_to_all of the host-deduplicated send sets,
        encoder.build_halo_structures; same-shard neighbors gather
        straight from the local table slice) and segment-sums locally.
        Replaces GSPMD's whole-table all-gather for the per-edge
        gathers; backward differentiates through the all_to_all (its
        transpose is the reverse exchange). Per-edge scalars (scale)
        stay replicated — they are O(E), not O(E*d)."""
        from jax.sharding import PartitionSpec as PS

        send = graph[f"halo_{rb_key}_send"]
        nbrh = graph[f"halo_{rb_key}_nbr"]
        posh = graph[f"halo_{rb_key}_pos"]
        typh = graph[f"halo_{rb_key}_type"]
        nodeh = graph[f"halo_{rb_key}_node"]
        S = int(graph["halo_shard_size"])
        Pn = nbrh.shape[0]
        Npad = Pn * S
        d = xw.shape[1]
        K = nbrh.shape[2]
        N = self.num_entities
        xw_pad = jnp.pad(xw, ((0, Npad - xw.shape[0]), (0, 0)))
        has_rw = rw is not None
        rw_arg = rw if has_rw else jnp.zeros((1, d), xw.dtype)

        def local(xw_l, send_l, nbr_l, pos_l, typ_l, node_l, sc, rw_t):
            # xw_l [S, d]; send_l [1, P, rmax]. Gather table = local
            # slice ++ exchanged boundary: slot s<S is the shard's own
            # row s, slot S + q*rmax + i is shard q's i-th boundary row
            # for this shard (the q==self lane is a device-local copy).
            send_buf = jnp.take(xw_l, send_l[0], axis=0)
            halo = jax.lax.all_to_all(send_buf, "model", 0, 0)
            tab = jnp.concatenate([xw_l, halo.reshape(-1, d)], axis=0)
            acc = jnp.zeros((nbr_l.shape[1], d), xw_l.dtype)
            for k in range(K):
                p_ = pos_l[0, :, k]
                s_ = jnp.where(
                    p_ >= 0, jnp.take(sc, jnp.maximum(p_, 0)), 0.0
                )
                m = jnp.take(tab, nbr_l[0, :, k], axis=0)
                if has_rw:
                    m = m - jnp.take(rw_t, typ_l[0, :, k], axis=0)
                acc = acc + m * s_[:, None]
            return segment_sum(acc, node_l[0], S,
                               indices_are_sorted=True)

        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(PS("model", None), PS("model", None, None),
                      PS("model", None, None), PS("model", None, None),
                      PS("model", None, None), PS("model", None),
                      PS(), PS()),
            out_specs=PS("model", None),
            check_vma=False,
        )(xw_pad, send, nbrh, posh, typh, nodeh, scale, rw_arg)
        return out[:N]

    def _attention_rb_keys(self) -> Tuple[str, ...]:
        """Row-block edge-set keys the attention path needs (non-loop
        modes only; self-loops aggregate densely, one edge per node)."""
        keys = []
        for mode in self.modes:
            if mode == "loop":
                continue
            keys.append(mode if mode in ("in", "out") else (
                "single" if self.self_edge_weight else "single_with_loops"
            ))
        return tuple(keys)

    def _attention_accumulate(self, tab, node, nbr, types, pos, sc,
                              r_full, weight, att_w, mw_table, alpha,
                              drop_mask):
        """Numerator/denominator of the RAGAT edge softmax accumulated
        over padded-CSR row blocks — per column: compose, transform,
        score, exp — with NO [E, d] message buffer (the legacy concat
        branch in apply() materializes three of them; reference
        rgnn_encoder.py:562-584 keeps per-edge messages by design).
        The single copy of these numerics shared by the single-device
        path and the sharded halo path: ``tab`` is the neighbor gather
        source (the full embedding table, or a shard's local slice ++
        exchanged boundary rows — whose leading rows double as the
        destination source for ``node``). ``sc`` is the per-edge mask
        vector the ``pos`` arrays index; ``drop_mask`` the pre-drawn
        propagation-dropout multiplier per (row, k) entry (None =
        eval). The accumulation is rematerialized in the backward
        (jax.checkpoint) so autodiff keeps no per-column residuals.
        ``mw_table``/``alpha`` are only read when the corresponding
        layer flag is set (callers may pass None or dummies)."""
        K = nbr.shape[1]

        @jax.checkpoint
        def accumulate(tab, r_full, weight, att_w, mw_table, alpha, sc):
            h_i = jnp.take(tab, node, axis=0)
            num = jnp.zeros((node.shape[0], self.out_dim), tab.dtype)
            den = jnp.zeros((node.shape[0], 1), tab.dtype)
            for k in range(K):
                nb, tp, p = nbr[:, k], types[:, k], pos[:, k]
                s = jnp.where(
                    p >= 0, jnp.take(sc, jnp.maximum(p, 0)), 0.0
                )
                h_j = jnp.take(tab, nb, axis=0)
                h_r = jnp.take(r_full, tp, axis=0)
                mw = (jnp.take(mw_table, tp, axis=0)
                      if self.message_weight else None)
                m = self.composition(h_i, h_j, h_r, mw) @ weight
                if self.learned_relation_weight:
                    m = m * jnp.take(alpha, tp, axis=0)
                m = m * s[:, None]
                # identical numerics to the legacy path: score on the
                # masked message, no max subtraction
                score = -jax.nn.leaky_relu(
                    (m @ att_w)[:, 0], negative_slope=0.2
                )
                # edge-dropped edges (s == 0) leave the softmax ENTIRELY
                # — the reference removes them from edge_index, so they
                # contribute nothing to the denominator (a zeroed
                # message would still add exp(0) = 1 per dropped edge)
                e = jnp.where((p >= 0) & (s > 0), jnp.exp(score), 0.0)
                ed = e if drop_mask is None else e * drop_mask[:, k]
                num = num + ed[:, None] * m
                den = den + e[:, None]
            return num, den

        return accumulate(tab, r_full, weight, att_w, mw_table, alpha,
                          sc)

    def _row_block_attention(self, params, x, r_full, graph, rb_key,
                             mask, weight, head: int, drop_mask):
        """Single-device RAGAT attention over padded-CSR row blocks
        (numerics in _attention_accumulate)."""
        node = graph[f"rb_{rb_key}_node"]
        N = self.num_entities
        mw_table = (params[f"w_msgweight_h{head}"]
                    if self.message_weight else None)
        alpha = params["alpha"] if self.learned_relation_weight else None
        num, den = self._attention_accumulate(
            x, node, graph[f"rb_{rb_key}_nbr"], graph[f"rb_{rb_key}_type"],
            graph[f"rb_{rb_key}_pos"], mask, r_full, weight,
            params[f"w_att_h{head}"], mw_table, alpha, drop_mask,
        )
        return (
            segment_sum(num, node, N, indices_are_sorted=True),
            segment_sum(den, node, N, indices_are_sorted=True),
        )

    def _halo_gather_table(self, x, graph, rb_key, mesh) -> jnp.ndarray:
        """Per-shard neighbor gather table for attention under the
        vocab-sharded mesh: local [S, d] slice ++ one all_to_all of the
        cross-shard boundary rows (slot layout as in _halo_rowblock).
        Attention composes per edge, so the mode matmul cannot hoist
        before the gather the way _halo_rowblock's xw payload does —
        the exchanged payload here is RAW x, independent of the head
        and mode weights, so one table per edge set is built per layer
        application and shared across all heads (and across modes with
        the same rb_key). Returns [P, S + P*rmax, d] sharded over the
        model axis."""
        from jax.sharding import PartitionSpec as PS

        send = graph[f"halo_{rb_key}_send"]
        S = int(graph["halo_shard_size"])
        Pn = send.shape[0]
        d = x.shape[1]
        x_pad = jnp.pad(x, ((0, Pn * S - x.shape[0]), (0, 0)))

        def local(x_l, send_l):
            send_buf = jnp.take(x_l, send_l[0], axis=0)
            halo = jax.lax.all_to_all(send_buf, "model", 0, 0)
            return jnp.concatenate([x_l, halo.reshape(-1, d)],
                                   axis=0)[None]

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(PS("model", None), PS("model", None, None)),
            out_specs=PS("model", None, None),
            check_vma=False,
        )(x_pad, send)

    def _halo_attention(self, params, tab, r_full, graph, rb_key, mask,
                        weight, head: int, drop_mask, mesh):
        """RAGAT attention under a vocab-sharded mesh: the same
        edge-partitioned halo layout as _halo_rowblock, consuming the
        pre-exchanged gather table from _halo_gather_table and running
        the numerator/denominator accumulation shard-locally. Relation
        tables, attention vectors, and per-edge scalars stay
        replicated."""
        from jax.sharding import PartitionSpec as PS

        nbrh = graph[f"halo_{rb_key}_nbr"]
        posh = graph[f"halo_{rb_key}_pos"]
        typh = graph[f"halo_{rb_key}_type"]
        nodeh = graph[f"halo_{rb_key}_node"]
        S = int(graph["halo_shard_size"])
        Pn = nbrh.shape[0]
        K = nbrh.shape[2]
        N = self.num_entities
        d = tab.shape[2]
        att_w = params[f"w_att_h{head}"]
        mw_table = (params[f"w_msgweight_h{head}"]
                    if self.message_weight else jnp.zeros((1, d), tab.dtype))
        alpha = (params["alpha"] if self.learned_relation_weight
                 else jnp.zeros((1, 1), tab.dtype))
        dm = (drop_mask if drop_mask is not None
              else jnp.ones((Pn, 1, K), tab.dtype))

        def local(tab_l, nbr_l, pos_l, typ_l, node_l, dm_l,
                  r_t, w, aw, mw_t, al, sc):
            node_loc = node_l[0]
            num, den = self._attention_accumulate(
                tab_l[0], node_loc, nbr_l[0], typ_l[0], pos_l[0], sc,
                r_t, w, aw, mw_t, al,
                dm_l[0] if drop_mask is not None else None,
            )
            return (segment_sum(num, node_loc, S, indices_are_sorted=True),
                    segment_sum(den, node_loc, S, indices_are_sorted=True))

        num, den = jax.shard_map(
            local, mesh=mesh,
            in_specs=(PS("model", None, None), PS("model", None, None),
                      PS("model", None, None), PS("model", None, None),
                      PS("model", None), PS("model", None, None),
                      PS(), PS(), PS(), PS(), PS(), PS()),
            out_specs=(PS("model", None), PS("model", None)),
            check_vma=False,
        )(tab, nbrh, posh, typh, nodeh, dm, r_full, weight,
          att_w, mw_table, alpha, mask)
        return num[:N], den[:N]

    def _per_relation_out(self, params, x, r_full, graph, edge_mask,
                          ctx: Ctx) -> jnp.ndarray:
        """Scan over padded relation buckets; one matmul per relation."""
        edge_index, edge_type = graph["edge_index"], graph["edge_type"]
        src_all, nbr_all = edge_index[0], edge_index[1]
        N = self.num_entities
        if self.use_edge_norm:
            # degree over the whole graph (reference per_relation branch)
            deg = segment_sum(edge_mask, src_all, N)
            deg_inv = jnp.where(
                deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0
            )
        buckets = graph["rel_buckets"]          # [M, Emax], -1 padded
        bucket_rels = graph["rel_bucket_ids"]   # [M]

        use_blocks = self.propagation == "per_relation_block"
        if use_blocks:
            nb = self.num_blocks_or_bases
            bi = self.in_dim // nb
            bo = self.out_dim // nb

        # the reference applies prop_drop to each RELATION's aggregated
        # [N, d] message (every relation is a mode there). Applying the
        # relation's mask at edge level is exactly equivalent —
        # mask*a + mask*b = mask*(a+b) — and keying it by relation id
        # keeps bucket rows of a split relation on one mask.
        drop_rng = None
        if ctx.train and self.prop_dropout > 0:
            drop_rng = ctx.take_rng()
            keep = 1.0 - self.prop_dropout

        def step(acc, inp):
            bucket, rel = inp
            valid = (bucket >= 0).astype(x.dtype)
            pos = jnp.maximum(bucket, 0)
            src = src_all[pos]
            nbr = nbr_all[pos]
            mask = valid * edge_mask[pos]
            h_j = jnp.take(x, nbr, axis=0)
            h_r = jnp.broadcast_to(r_full[rel][None, :], h_j.shape)
            composed = self.composition(None, h_j, h_r, None)
            if use_blocks:
                blocks = params["w_blocks"][rel]       # [nb, bi, bo]
                msg = jnp.einsum(
                    "ebi,bio->ebo",
                    composed.reshape(-1, nb, bi), blocks,
                ).reshape(-1, self.out_dim)
            else:
                w = jnp.einsum("b,bio->io", params["comps"][rel],
                               params["bases"])
                msg = composed @ w
            if self.learned_relation_weight:
                msg = msg * params["alpha"][rel]
            if self.use_edge_norm:
                msg = msg * (deg_inv[src] * deg_inv[nbr] * mask)[:, None]
            else:
                msg = msg * mask[:, None]
            if drop_rng is not None:
                rel_mask = jax.random.bernoulli(
                    jax.random.fold_in(drop_rng, rel), keep,
                    (N, self.out_dim),
                ).astype(msg.dtype)
                msg = msg * jnp.take(rel_mask, src, axis=0) / keep
            # scatter-add straight into the carry: `acc + segment_sum`
            # would build (and read back) a fresh [N, d] buffer every
            # bucket row
            return acc.at[src].add(msg), None

        acc0 = jnp.zeros((N, self.out_dim), x.dtype)
        out, _ = jax.lax.scan(step, acc0, (buckets, bucket_rels))
        return out

    def apply(self, params, x, r, graph, ctx: Ctx) -> Tuple[jnp.ndarray, jnp.ndarray]:
        edge_index, edge_type = graph["edge_index"], graph["edge_type"]
        E = edge_index.shape[1]
        N = self.num_entities
        if self.weight_decomposition == "relation_basis":
            r = params["relation_basis_weights"] @ params["basis_vectors"]
        r_full = jnp.concatenate([r, params["loop_rel"]], axis=0)
        loop_rel_id = r_full.shape[0] - 1
        edge_mask, self_mask = self._edge_masks(
            ctx, E, x.dtype, graph.get("edge_orig")
        )
        # key PRESENCE is a static pytree property (safe under jit);
        # the builder adds it only when it sorted the halves
        halves_sorted = "halves_sorted" in graph
        loop_idx = jnp.arange(N, dtype=edge_index.dtype)
        loop_types = jnp.full((N,), loop_rel_id, dtype=edge_type.dtype)

        def mode_edges(mode):
            """(src, nbr, types, mask, is_loop, src_sorted)."""
            if mode == "in":
                sl = slice(0, E // 2)
                return (edge_index[0, sl], edge_index[1, sl],
                        edge_type[sl], edge_mask[sl], False, halves_sorted)
            if mode == "out":
                sl = slice(E // 2, E)
                return (edge_index[0, sl], edge_index[1, sl],
                        edge_type[sl], edge_mask[sl], False, halves_sorted)
            if mode == "loop":
                return loop_idx, loop_idx, loop_types, self_mask, True, True
            # "" : all edges; without a self-edge weight the loops ride along
            if not self.self_edge_weight:
                return (
                    jnp.concatenate([edge_index[0], loop_idx]),
                    jnp.concatenate([edge_index[1], loop_idx]),
                    jnp.concatenate([edge_type, loop_types]),
                    jnp.concatenate([edge_mask, self_mask]),
                    False, False,
                )
            return (edge_index[0], edge_index[1], edge_type, edge_mask,
                    False, False)

        num_modes = len(self.modes)
        head_outputs = []
        halo_tabs = {}  # one boundary exchange per rb_key, all heads
        for head in range(self.num_heads):
            if self.propagation.startswith("per_relation"):
                out = self._per_relation_out(
                    params, x, r_full, graph, edge_mask, ctx
                )
                # self-loop mode with its own weight
                h_r = jnp.broadcast_to(params["loop_rel"], x.shape)
                composed = self.composition(x, x, h_r, None)
                loop_msg = (composed @ params["w_loop"]) * self_mask[:, None]
                out = out + loop_msg
                head_outputs.append(out)
                continue

            if self.attention and all(
                    f"rb_{k}_nbr" in graph
                    for k in self._attention_rb_keys()):
                # row-block attention: sum per-mode (numerator,
                # denominator) pairs — additive, so modes combine
                # exactly as the legacy concat-then-softmax does
                att_w = params[f"w_att_h{head}"]
                num = jnp.zeros((N, self.out_dim), x.dtype)
                den = jnp.zeros((N, 1), x.dtype)
                for mode in self.modes:
                    src, nbr, types, mask, is_loop, _ = mode_edges(mode)
                    if is_loop:
                        msg = self._edge_messages(
                            params, x, r_full, src, nbr, types, mask,
                            params[f"w_{mode}_h{head}"], head, True,
                            None, ctx,
                        )
                        score = -jax.nn.leaky_relu(
                            (msg @ att_w)[:, 0], negative_slope=0.2
                        )
                        # self-edge-dropped loops leave the softmax
                        # entirely (reference removes them)
                        e = (jnp.exp(score) * (mask > 0))[:, None]
                        num = num + ctx.dropout(e, self.prop_dropout) * msg
                        den = den + e
                    else:
                        rb_key = mode if mode in ("in", "out") else (
                            "single" if self.self_edge_weight
                            else "single_with_loops"
                        )
                        use_halo = (graph.get("halo_mesh") is not None
                                    and f"halo_{rb_key}_nbr" in graph)
                        mask_shape = (graph[f"halo_{rb_key}_nbr"].shape
                                      if use_halo
                                      else graph[f"rb_{rb_key}_nbr"].shape)
                        drop_mask = None
                        if ctx.train and self.prop_dropout > 0:
                            # under the mesh the mask is drawn in the
                            # per-shard layout: a valid dropout pattern,
                            # though not bit-identical to single-device
                            keep = 1.0 - self.prop_dropout
                            drop_mask = jax.random.bernoulli(
                                ctx.take_rng(), keep, mask_shape,
                            ).astype(x.dtype) / keep
                        if use_halo:
                            if rb_key not in halo_tabs:
                                halo_tabs[rb_key] = self._halo_gather_table(
                                    x, graph, rb_key, graph["halo_mesh"]
                                )
                            n_m, d_m = self._halo_attention(
                                params, halo_tabs[rb_key], r_full, graph,
                                rb_key, mask,
                                params[f"w_{mode}_h{head}"], head,
                                drop_mask, graph["halo_mesh"],
                            )
                        else:
                            n_m, d_m = self._row_block_attention(
                                params, x, r_full, graph, rb_key, mask,
                                params[f"w_{mode}_h{head}"], head,
                                drop_mask,
                            )
                        num = num + n_m
                        den = den + d_m
                den = jnp.where(den == 0.0, 1.0, den)
                head_outputs.append(num / den)
                continue

            per_mode = []
            for mode in self.modes:
                src, nbr, types, mask, is_loop, src_sorted = mode_edges(mode)
                norm = None
                if self.use_edge_norm and not is_loop:
                    norm = degree_norm(src, nbr, mask, N,
                                       src_sorted=src_sorted)
                rb_key = mode if mode in ("in", "out") else (
                    None if mode == "loop" else (
                        "single" if self.self_edge_weight
                        else "single_with_loops"
                    )
                )
                if (not self.attention and rb_key is not None
                        and f"rb_{rb_key}_nbr" in graph):
                    scale = norm if norm is not None else mask
                    if self.learned_relation_weight:
                        scale = scale * jnp.take(
                            params["alpha"], types, axis=0
                        )[:, 0]
                    agg = self._row_block_aggregate(
                        params, x, r_full, graph, rb_key, scale,
                        params[f"w_{mode}_h{head}"], head,
                        edge_src=src, edge_types=types,
                    )
                    if not is_loop:
                        agg = ctx.dropout(agg, self.prop_dropout)
                    if self.propagation == "direction":
                        agg = agg / num_modes
                    per_mode.append(agg)
                    continue
                msg = self._edge_messages(
                    params, x, r_full, src, nbr, types, mask,
                    params[f"w_{mode}_h{head}"], head, is_loop, norm, ctx,
                )
                if self.attention:
                    per_mode.append((msg, src, mask))
                else:
                    agg = segment_sum(msg, src, N,
                                      indices_are_sorted=src_sorted)
                    if not is_loop:
                        agg = ctx.dropout(agg, self.prop_dropout)
                    if self.propagation == "direction":
                        agg = agg / num_modes
                    per_mode.append(agg)
            if self.attention:
                # RAGAT attention: edge-level softmax per target node
                messages = jnp.concatenate([m for m, _, _ in per_mode], axis=0)
                dst = jnp.concatenate([s for _, s, _ in per_mode], axis=0)
                emask = jnp.concatenate([m for _, _, m in per_mode], axis=0)
                att_w = params[f"w_att_h{head}"]
                scores = -jax.nn.leaky_relu(
                    (messages @ att_w).reshape(-1), negative_slope=0.2
                )
                # dropped edges leave the softmax entirely (the reference
                # removes them from edge_index, so they add nothing to
                # the denominator)
                edge_exp = (jnp.exp(scores) * (emask > 0))[:, None]
                entity_exp = segment_sum(edge_exp, dst, N)
                entity_exp = jnp.where(entity_exp == 0.0, 1.0, entity_exp)
                edge_exp = ctx.dropout(edge_exp, self.prop_dropout)
                weighted = segment_sum(edge_exp * messages, dst, N)
                head_outputs.append(weighted / entity_exp)
            else:
                out = per_mode[0]
                for m in per_mode[1:]:
                    out = out + m
                head_outputs.append(out)

        out = head_outputs[0] / self.num_heads if self.attention else head_outputs[0]
        for h in head_outputs[1:]:
            out = out + h / self.num_heads
        if self.bias_:
            out = out + params["bias"]
        if not self.propagation.startswith("per_relation"):
            out = batch_norm_affine(out, params, f"{self.name}_bn", ctx)
        # relation transform (drops the loop relation row)
        if self.rel_transformation == "self":
            rel = r_full[:-1]
        elif self.rel_transformation == "linear":
            rel = (r_full @ params["w_rel"])[:-1]
        else:
            raise NotImplementedError(
                f"rel_transformation {self.rel_transformation}"
            )
        return out, rel


class RgcnLayer(RgnnLayerBase):
    """R-GCN layer: sum_r A_r X W_r with per-(relation, node) mean
    normalization (reference TorchRgcnLayer, rgnn_encoder.py:600-906).

    The reference's vertical/horizontal sparse stackings are the same
    math in different compute layouts; BOTH normalize each edge by
    1 / |{same-relation edges of its aggregation node}| — the paper's
    1/c_{i,r}. (Horizontal stacking gets there via a transpose trick
    plus a swap of the forward/inverse halves' column sums,
    rgnn_encoder.py:694-702.) Both legs are verified numerically
    against the reference in tests/test_reference_parity.py, so the
    ``torch_rgcn_args.vertical_stacking`` flag is accepted but has no
    effect here.
    """

    def __init__(self, name, config, dataset, in_dim, out_dim, options):
        super().__init__(name, config, dataset, in_dim, out_dim, options)
        self.num_relations = dataset.num_relations() * 2 + 1  # + self edge
        self.weight_decomposition = options["weight_decomposition"]
        self.num_blocks_or_bases = options["num_blocks_or_bases"]

    def init_params(self, rng) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.bias_:
            params["bias"] = init_weight(
                k3, (self.out_dim,), self.bias_init
            )
        if self.weight_decomposition == "basis":
            if self.num_blocks_or_bases <= 0:
                raise ValueError("basis decomposition needs > 0 bases")
            params["bases"] = init_weight(
                k1, (self.num_blocks_or_bases, self.in_dim, self.out_dim),
                self.weight_init,
            )
            params["comps"] = init_weight(
                k2, (self.num_relations, self.num_blocks_or_bases),
                self.weight_init,
            )
        elif self.weight_decomposition == "block":
            nb = self.num_blocks_or_bases
            bi, ri = divmod(self.in_dim, nb)
            bo, ro = divmod(self.out_dim, nb)
            if ri or ro:
                raise RuntimeError("weight dims not divisible by blocks")
            fans = [self.num_base_relations, bi]
            params["blocks"] = schlichtkrull_normal_(
                k1, (self.num_relations - 1, nb, bi, bo), fans=fans
            )
            params["block_self"] = schlichtkrull_normal_(
                k2, (self.in_dim, self.out_dim), fans=fans
            )
        else:
            params["weights"] = init_weight(
                k1, (self.num_relations, self.in_dim, self.out_dim),
                self.weight_init,
            )
        return params

    def apply(self, params, x, r, graph, ctx: Ctx):
        edge_index, edge_type = graph["edge_index"], graph["edge_type"]
        E = edge_index.shape[1]
        N = self.num_entities
        R = self.num_relations
        edge_mask, self_mask = self._edge_masks(
            ctx, E, x.dtype, graph.get("edge_orig")
        )
        src_all, nbr_all = edge_index[0], edge_index[1]

        # per-(rel, aggregation-node) mean normalization via host-built
        # dense group ids (a [R*N] count buffer would be multi-GB at
        # scale); identical for both stackings — see class docstring
        groups = graph["rgcn_groups_vert"]
        num_groups = graph["rgcn_num_groups_vert"]
        counts = segment_sum(edge_mask, groups, num_groups)
        self_counts = self_mask  # self edges: one per node

        use_blocks = self.weight_decomposition == "block"
        if use_blocks:
            nb = self.num_blocks_or_bases
            bi = self.in_dim // nb

        buckets = graph["rel_buckets"]
        bucket_rels = graph["rel_bucket_ids"]

        def step(acc, inp):
            bucket, rel = inp
            valid = (bucket >= 0).astype(x.dtype)
            pos = jnp.maximum(bucket, 0)
            src = src_all[pos]
            nbr = nbr_all[pos]
            mask = valid * edge_mask[pos]
            vals = mask / jnp.maximum(counts[groups[pos]], 1.0)
            h_j = jnp.take(x, nbr, axis=0)
            if use_blocks:
                blocks = params["blocks"][rel]
                msg = jnp.einsum(
                    "ebi,bio->ebo", h_j.reshape(-1, nb, bi), blocks
                ).reshape(-1, self.out_dim)
            elif self.weight_decomposition == "basis":
                w = jnp.einsum("b,bio->io", params["comps"][rel],
                               params["bases"])
                msg = h_j @ w
            else:
                msg = h_j @ params["weights"][rel]
            msg = msg * vals[:, None]
            # scatter-add straight into the carry (see
            # MessagePassingLayer._per_relation_out)
            return acc.at[src].add(msg), None

        acc0 = jnp.zeros((N, self.out_dim), x.dtype)
        out, _ = jax.lax.scan(step, acc0, (buckets, bucket_rels))

        # self edges (relation R-1)
        if use_blocks:
            self_w = params["block_self"]
        elif self.weight_decomposition == "basis":
            self_w = jnp.einsum(
                "b,bio->io", params["comps"][R - 1], params["bases"]
            )
        else:
            self_w = params["weights"][R - 1]
        self_vals = self_mask / jnp.maximum(self_counts, 1.0)
        out = out + (x @ self_w) * self_vals[:, None]
        if self.bias_:
            out = out + params["bias"]
        return out, r


class WeightedGCNLayer(RgnnLayerBase):
    """W-GCN layer: alpha_r-weighted symmetric adjacency, one shared
    weight (reference: rgnn_encoder.py:908-998)."""

    def __init__(self, name, config, dataset, in_dim, out_dim, options):
        super().__init__(name, config, dataset, in_dim, out_dim, options)
        self.num_relations = dataset.num_relations() * 2 + 1

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        params = {
            "weight": init_weight(
                k1, (self.in_dim, self.out_dim), self.weight_init
            ),
            # the reference declares alpha as Embedding(..., padding_idx=0)
            # (rgnn_encoder.py:938): row 0 starts at zero and never
            # receives gradient, so relation 0 contributes nothing; apply
            # pins the row to reproduce that exactly
            "alpha": init_weight(
                k2, (self.num_relations + 1, 1), "normal_"
            ).at[0].set(0.0),
            "bn_scale": jnp.ones(self.out_dim),
            "bn_bias": jnp.zeros(self.out_dim),
        }
        if self.bias_:
            params["bias"] = init_weight(k3, (self.out_dim,), self.bias_init)
        return params

    def init_state(self):
        return {
            f"{self.name}_bn": {
                "mean": jnp.zeros(self.out_dim),
                "var": jnp.ones(self.out_dim),
            }
        }

    def apply(self, params, x, r, graph, ctx: Ctx):
        edge_index, edge_type = graph["edge_index"], graph["edge_type"]
        E = edge_index.shape[1]
        N = self.num_entities
        # the reference WGCN layer has no edge dropout (only self-edge
        # dropout); skip the edge-mask draw entirely
        if ctx.train and self.self_edge_dropout > 0:
            self_mask = jax.random.bernoulli(
                ctx.take_rng(), 1.0 - self.self_edge_dropout, (N,)
            ).astype(x.dtype)
        else:
            self_mask = jnp.ones(N, x.dtype)
        # note: edges already include inverse copies AND the reference
        # additionally symmetrizes with A^T (rgnn_encoder.py:957-958);
        # the explicit transpose pass below matches that exactly
        src = jnp.concatenate([edge_index[0], jnp.arange(N, dtype=edge_index.dtype)])
        dst = jnp.concatenate([edge_index[1], jnp.arange(N, dtype=edge_index.dtype)])
        types = jnp.concatenate([
            edge_type,
            jnp.full((N,), self.num_relations - 1, dtype=edge_type.dtype),
        ])
        mask = jnp.concatenate([jnp.ones(E, x.dtype), self_mask])
        # torch padding_idx=0 semantics: row 0 is pinned to zero and gets
        # no gradient (the multiply-by-zero kills both value and grad)
        alpha_table = params["alpha"].at[0].multiply(0.0)
        alpha = jnp.take(alpha_table, types, axis=0)[:, 0] * mask
        xw = x @ params["weight"]
        # symmetric adjacency: A + A^T
        msg = jnp.take(xw, dst, axis=0) * alpha[:, None]
        out = segment_sum(msg, src, N)
        msg_t = jnp.take(xw, src, axis=0) * alpha[:, None]
        out = out + segment_sum(msg_t, dst, N)
        if self.bias_:
            out = out + params["bias"]
        out = batch_norm_affine(out, params, f"{self.name}_bn", ctx)
        return out, r
