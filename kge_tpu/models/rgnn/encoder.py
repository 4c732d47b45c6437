"""R-GNN encoder stack and encoder-decoder model (reference:
kge/model/embedder/rgnn_encoder.py:1002-1328 and
kge/model/kge_model.py:774-1066).

The encoder runs the GNN over the whole training graph and the decoder
scorer consumes the contextualized embeddings. Functional re-design:

- the graph lives in host numpy buffers on the encoder (rebuilt on
  per-epoch graph sampling) and enters the compiled step as constants
- ``use_stale_embeddings`` (the reference's cached-forward +
  retain_graph trick, rgnn_encoder.py:1241-1267) becomes a trace-time
  memo in Ctx: the encoder output is computed once per compiled step and
  shared by all loss terms, and the gradient of the summed loss through
  the single encoder forward is exactly the math the reference gets from
  retained autograd graphs
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models.api import Ctx, KgeBase, KgeModel
from kge_tpu.models.rgnn.layers import (
    MessagePassingLayer,
    RgcnLayer,
    WeightedGCNLayer,
)

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


from kge_tpu.utils.misc import pow2_bucket as _bucket_pow2


def _row_blocks(agg_nodes: np.ndarray, nbr_nodes: np.ndarray,
                types: np.ndarray, positions: np.ndarray, num_nodes: int,
                K: int) -> Dict[str, np.ndarray]:
    """Padded-CSR row blocks: each aggregation node's incident edges
    chunked into [num_rows, K] (hub nodes span multiple rows, bounding
    padding at ~K/2 per node). Aggregation then runs as K accumulated
    gathers with NO [E, d] message materialization and a tiny sorted
    second-level segment_sum rows -> nodes — measured 2.5x faster
    fwd+bwd than gather->segment_sum at FB15k-237 scale
    (benchmarks/micro_aggregate.py).

    The hot path is the O(E) native counting sort
    (kge_tpu/native/hostops.cpp row_blocks_*): the numpy argsort +
    [total, K] fancy-index build below costs minutes at Wikidata edge
    counts and is paid PER EPOCH under negative_sampling.graph_sampling.
    numpy remains the fallback and the parity referee
    (tests/test_rgnn.py::test_row_blocks_native_matches_numpy)."""
    try:
        from kge_tpu.native import row_blocks_native

        return row_blocks_native(agg_nodes, nbr_nodes, types, positions,
                                 num_nodes, K)
    except Exception:
        pass  # no toolchain / build failure: numpy fallback below
    order = np.argsort(agg_nodes, kind="stable")
    nodes_s = agg_nodes[order]
    counts = np.bincount(nodes_s, minlength=num_nodes)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    chunks = (counts + K - 1) // K
    total = int(chunks.sum())
    rows_node = np.repeat(np.arange(num_nodes, dtype=np.int64), chunks)
    cum_chunks = np.concatenate([[0], np.cumsum(chunks)])
    ordinal = np.arange(total, dtype=np.int64) - cum_chunks[rows_node]
    start = offsets[rows_node] + ordinal * K
    gpos = start[:, None] + np.arange(K, dtype=np.int64)[None, :]
    end = (offsets[rows_node] + counts[rows_node])[:, None]
    valid = gpos < end
    if len(order) == 0:
        orig = np.zeros((total, K), dtype=np.int64)
    else:
        orig = order[np.minimum(gpos, len(order) - 1)]
    return {
        "nbr": np.where(valid, nbr_nodes[orig], 0).astype(np.int32),
        "type": np.where(valid, types[orig], 0).astype(np.int32),
        "pos": np.where(valid, positions[orig], -1).astype(np.int32),
        "node": rows_node.astype(np.int32),
    }


def build_graph_buffers(triples: np.ndarray, num_relations: int,
                        per_relation: bool,
                        row_block_modes: Tuple[str, ...] = (),
                        block_size: int = 16,
                        num_entities: Optional[int] = None
                        ) -> Dict[str, np.ndarray]:
    """Edge buffers (+ inverse edges with offset relation ids) and, for
    per-relation layers, padded relation buckets for lax.scan."""
    fwd = triples[:, [0, 2]].T.astype(np.int32)
    n_sort = num_entities if num_entities is not None else (
        int(fwd.max()) + 1 if fwd.size else 1
    )
    # Sort each half by its aggregation node (edge_index[0]): the hot
    # segment_sum reductions then run with indices_are_sorted=True, and
    # the scatter-add becomes a sequential-access accumulation instead of
    # a general conflict-handling scatter. Halves sort independently so
    # the in/out slices stay contiguous; edge_orig keeps the
    # direct/inverse correlation for edge dropout. Node-id keys admit an
    # O(E + N) native counting sort (hostops.cpp); numpy is the fallback.
    try:
        from kge_tpu.native import counting_argsort_native

        order_fwd = counting_argsort_native(fwd[0], n_sort)
        order_inv = counting_argsort_native(fwd[1], n_sort)
    except Exception:
        order_fwd = np.argsort(fwd[0], kind="stable")
        order_inv = np.argsort(fwd[1], kind="stable")
    # 1-D contiguous gathers: fancy-indexing the [2, E] array along
    # axis 1 (and its reversed view) costs 10x+ at Wikidata edge counts
    E1 = fwd.shape[1]
    edge_index = np.empty((2, 2 * E1), np.int32)
    edge_index[0, :E1] = fwd[0][order_fwd]
    edge_index[1, :E1] = fwd[1][order_fwd]
    edge_index[0, E1:] = fwd[1][order_inv]
    edge_index[1, E1:] = fwd[0][order_inv]
    rels = np.ascontiguousarray(triples[:, 1]).astype(np.int32)
    edge_type = np.concatenate(
        [rels[order_fwd], rels[order_inv] + num_relations]
    ).astype(np.int32)
    graph: Dict[str, np.ndarray] = {
        "edge_index": np.ascontiguousarray(edge_index),
        "edge_type": edge_type,
        "edge_orig": np.concatenate([order_fwd, order_inv]).astype(np.int32),
        "halves_sorted": np.zeros(0, np.int32),  # marker: presence == sorted
    }
    E = edge_index.shape[1]
    N = num_entities if num_entities is not None else (
        int(edge_index.max()) + 1 if E else 1
    )
    loop_rel = 2 * num_relations
    for mode in row_block_modes:
        if mode == "in":
            sel = slice(0, E // 2)
            args = (edge_index[0, sel], edge_index[1, sel], edge_type[sel],
                    np.arange(0, E // 2, dtype=np.int64))
        elif mode == "out":
            # positions are MODE-LOCAL: they index the mode's own
            # mask/norm vectors, which the layer slices per half
            sel = slice(E // 2, E)
            args = (edge_index[0, sel], edge_index[1, sel], edge_type[sel],
                    np.arange(E // 2, dtype=np.int64))
        elif mode == "single":
            args = (edge_index[0], edge_index[1], edge_type,
                    np.arange(E, dtype=np.int64))
        elif mode == "single_with_loops":
            # loops ride along: positions E..E+N-1 index the concat mask
            loop = np.arange(N, dtype=np.int32)
            args = (
                np.concatenate([edge_index[0], loop]),
                np.concatenate([edge_index[1], loop]),
                np.concatenate(
                    [edge_type, np.full(N, loop_rel, np.int32)]
                ),
                np.arange(E + N, dtype=np.int64),
            )
        else:
            raise ValueError(f"unknown row-block mode {mode}")
        # TRANSPOSE row blocks (keyed by neighbor): the aggregation's
        # backward pass d_xw[j] = sum over incident (row, k) of
        # g_row * scale becomes the same accumulated-gather pattern as
        # the forward instead of K sequential full-buffer scatters
        # (layers._rowblock_gather_sum custom_vjp). The native path
        # builds forward + transpose in one O(E) pass; numpy fallback
        # boolean-indexes the forward blocks.
        try:
            from kge_tpu.native import row_blocks_with_transpose_native

            rb, trow, tpos, tnode = row_blocks_with_transpose_native(
                *args, num_nodes=N, K=block_size
            )
        except Exception:
            rb = _row_blocks(*args, num_nodes=N, K=block_size)
            valid = rb["pos"] >= 0
            rows_idx = np.broadcast_to(
                np.arange(rb["node"].shape[0], dtype=np.int64)[:, None],
                rb["nbr"].shape,
            )
            trb = _row_blocks(
                rb["nbr"][valid].astype(np.int64),
                rows_idx[valid],
                np.zeros(int(valid.sum()), dtype=np.int32),
                rb["pos"][valid].astype(np.int64),
                num_nodes=N, K=block_size,
            )
            trow, tpos, tnode = trb["nbr"], trb["pos"], trb["node"]
        for k, v in rb.items():
            graph[f"rb_{mode}_{k}"] = v
        graph[f"rb_{mode}_trow"] = trow
        graph[f"rb_{mode}_tpos"] = tpos
        graph[f"rb_{mode}_tnode"] = tnode
    if per_relation:
        rels, counts = np.unique(edge_type, return_counts=True)
        # chunk each relation's edges to a fixed width: skewed relation
        # distributions (real KGs) would otherwise pad every bucket to
        # the hottest relation's count (observed 14x slot blowup on
        # FB15k-237); chunking bounds padding at one row per relation
        # and the scan body handles repeated relation ids naturally
        emax = _bucket_pow2(int(counts.max())) if len(counts) else 1
        emax = min(emax, 2048)
        # bound bucket padding on skewed graphs: every nonempty relation
        # wastes < emax slots (its last partial chunk), so keeping
        # R * emax <= E/2 bounds the padded total at 1.5x the edge
        # count; the floor keeps per-chunk matmuls MXU-viable
        if len(counts):
            budget = max(8, E // (2 * len(rels)))
            emax = min(emax, 1 << (budget.bit_length() - 1))
        rows: list = []
        row_rels: list = []
        order = np.argsort(edge_type, kind="stable")
        start = 0
        for rel, c in zip(rels, counts):
            edges = order[start : start + c]
            start += c
            for off in range(0, c, emax):
                chunk = edges[off : off + emax]
                row = np.full(emax, -1, dtype=np.int32)
                row[: len(chunk)] = chunk
                rows.append(row)
                row_rels.append(rel)
        graph["rel_buckets"] = (
            np.stack(rows) if rows else np.full((1, emax), -1, np.int32)
        )
        graph["rel_bucket_ids"] = np.asarray(row_rels or [0], dtype=np.int32)
        # (relation, aggregation-node) group ids for RGCN mean
        # normalization — identical for both sparse stackings (see
        # layers.RgcnLayer docstring): dense group indices avoid
        # materializing a [R*N] count buffer on device (multi-GB at
        # Wikidata scale)
        nodes = edge_index[0]
        enc = edge_type.astype(np.int64) * (int(nodes.max()) + 1 if
                                            len(nodes) else 1) + nodes
        uniq, inv = np.unique(enc, return_inverse=True)
        graph["rgcn_groups_vert"] = inv.astype(np.int32)
        graph["rgcn_num_groups_vert"] = int(len(uniq))
    return graph


def build_halo_structures(graph: Dict[str, np.ndarray],
                          modes: Tuple[str, ...], P: int,
                          num_nodes_padded: int) -> Dict[str, np.ndarray]:
    """Edge-partitioned layout for the mesh GNN (SURVEY.md section 2.5:
    per-shard gather -> compose -> segment_sum with halo exchange of
    boundary entity embeddings over ICI; reference full-graph forward:
    kge/model/embedder/rgnn_encoder.py:1283-1303 has no notion of this).

    Row blocks are already keyed and sorted by aggregation node, so
    partitioning by the node's vocab shard is a contiguous split.
    Neighbors a shard already OWNS are gathered straight from its local
    [S, d] table slice (slots ``0..S-1``); only the CROSS-shard boundary
    rides the wire. For each (owner shard q, destination shard p, q!=p)
    pair the unique remote neighbors q must send to p become
    ``send[q, p, :]`` (local row ids on q, padded to the max remote
    boundary width rmax); each destination's neighbor ids are remapped
    to gather-table slots — local rows verbatim, remote rows at
    ``S + q * rmax + rank``. The device-side consumer
    (MessagePassingLayer._halo_rowblock) concatenates its local slice
    with one all_to_all of the boundary buffers, so per-layer ICI
    volume is (P-1) * rmax * d per shard instead of the whole
    vocab-sharded [V, d] table GSPMD would all-gather.
    """
    S = num_nodes_padded // P
    out: Dict[str, np.ndarray] = {"halo_shard_size": S}
    for mode in modes:
        nbr = graph[f"rb_{mode}_nbr"]
        typ = graph[f"rb_{mode}_type"]
        pos = graph[f"rb_{mode}_pos"]
        node = graph[f"rb_{mode}_node"]
        K = nbr.shape[1]
        owner_rows = node.astype(np.int64) // S
        rows_per = np.bincount(owner_rows, minlength=P)
        Rmax = max(1, int(rows_per.max()))
        shard_data = []
        send_lists: list = [[np.zeros(0, np.int64)] * P for _ in range(P)]
        for p in range(P):
            sel = owner_rows == p
            nbr_p, pos_p = nbr[sel], pos[sel]
            vals = nbr_p[pos_p >= 0].astype(np.int64)
            remote = np.unique(vals[vals // S != p])
            owners = remote // S
            for q in range(P):
                if q != p:
                    send_lists[q][p] = remote[owners == q] % S
            shard_data.append((sel, remote, owners))
        rmax = max(1, max(
            (len(send_lists[q][p]) for q in range(P) for p in range(P)),
            default=1,
        ))
        send = np.zeros((P, P, rmax), np.int32)
        for q in range(P):
            for p in range(P):
                L = send_lists[q][p]
                send[q, p, : len(L)] = L
        nbr_s = np.zeros((P, Rmax, K), np.int32)
        pos_s = np.full((P, Rmax, K), -1, np.int32)
        typ_s = np.zeros((P, Rmax, K), np.int32)
        # padding rows aggregate zeros into local node S-1 (pos -1 =>
        # zero scale), keeping per-shard segment ids sorted
        node_s = np.full((P, Rmax), S - 1, np.int32)
        for p, (sel, remote, owners) in enumerate(shard_data):
            # gather-table slot per remote boundary entity
            slot = np.empty(len(remote), np.int64)
            for q in range(P):
                qsel = np.where(owners == q)[0]
                slot[qsel] = S + q * rmax + np.arange(len(qsel))
            nbr_p, pos_p = nbr[sel], pos[sel]
            flat = nbr_p.astype(np.int64).ravel()
            mapped = np.zeros(flat.shape, np.int64)
            validf = (pos_p >= 0).ravel()
            if validf.any():
                fv = flat[validf]
                is_local = fv // S == p
                m = np.where(is_local, fv % S, 0)
                if len(remote):
                    ridx = np.clip(
                        np.searchsorted(remote, fv), 0, len(remote) - 1
                    )
                    m = np.where(is_local, m, slot[ridx])
                mapped[validf] = m
            n_p = int(sel.sum())
            nbr_s[p, :n_p] = mapped.reshape(nbr_p.shape)
            pos_s[p, :n_p] = pos_p
            typ_s[p, :n_p] = typ[sel]
            node_s[p, :n_p] = node[sel].astype(np.int64) - p * S
        out[f"halo_{mode}_send"] = send
        out[f"halo_{mode}_nbr"] = nbr_s
        out[f"halo_{mode}_pos"] = pos_s
        out[f"halo_{mode}_type"] = typ_s
        out[f"halo_{mode}_node"] = node_s
    return out


class Rgnn(KgeBase):
    """Stack of R-GNN layers (reference: rgnn_encoder.py:1002-1205)."""

    def __init__(self, config: Config, dataset: Dataset,
                 configuration_key: str, dim: int):
        super().__init__(config, dataset, configuration_key)
        num_layers = self.get_option("num_layers")
        act_key = self.get_option("activation")
        if act_key not in _ACTIVATIONS:
            raise ValueError(f"invalid activation {act_key}")
        self.activation = _ACTIVATIONS[act_key]
        self.emb_entity_dropout = self.get_option("emb_entity_dropout")
        try:
            self.neighbor_block_size = int(
                self.get_option("neighbor_block_size")
            )
        except KeyError:
            self.neighbor_block_size = 16
        self.layer_type = self.check_option(
            "layer_type", ["message_passing", "torch_rgcn", "weighted_gcn"]
        )
        options = {
            "weight_init": self.get_option("weight_init"),
            "bias": self.get_option("bias"),
            "bias_init": self.get_option("bias_init"),
            "edge_dropout": self.get_option("edge_dropout"),
            "self_edge_dropout": self.get_option("self_edge_dropout"),
            "rel_transformation": self.get_option("rel_transformation"),
            "weight_decomposition": str(self.get_option("weight_decomposition")),
            "num_blocks_or_bases": self.get_option("num_blocks_or_bases"),
            "message_passing_args": {
                "propagation": self.get_option("message_passing_args.propagation"),
                "composition": self.get_option("message_passing_args.composition"),
                "message_weight": self.get_option(
                    "message_passing_args.message_weight"),
                "learned_relation_weight": self.get_option(
                    "message_passing_args.learned_relation_weight"),
                "edge_norm": self.get_option("message_passing_args.edge_norm"),
                "emb_propagation_dropout": self.get_option(
                    "message_passing_args.emb_propagation_dropout"),
                "attention": self.get_option("message_passing_args.attention"),
                "num_heads": self.get_option("message_passing_args.num_heads"),
            },
            "torch_rgcn_args": {
                "vertical_stacking": self.get_option(
                    "torch_rgcn_args.vertical_stacking"),
            },
        }
        self.layers = []
        in_dim = dim
        for i in range(num_layers):
            try:
                out_dim = self.get_option(f"{i + 1}_out_dim")
                if out_dim < 0:
                    out_dim = in_dim
            except KeyError:
                out_dim = in_dim
            name = f"{configuration_key}.layer{i}"
            if self.layer_type == "message_passing":
                layer = MessagePassingLayer(
                    name, config, dataset, in_dim, out_dim, options,
                    first_layer=(i == 0),
                )
            elif self.layer_type == "torch_rgcn":
                layer = RgcnLayer(name, config, dataset, in_dim, out_dim,
                                  options)
            else:
                layer = WeightedGCNLayer(name, config, dataset, in_dim,
                                         out_dim, options)
            self.layers.append(layer)
            in_dim = out_dim
        self.out_dim = in_dim

    @property
    def needs_rel_buckets(self) -> bool:
        return self.layer_type == "torch_rgcn" or any(
            isinstance(l, MessagePassingLayer)
            and l.propagation.startswith("per_relation")
            for l in self.layers
        )

    @property
    def row_block_modes(self) -> Tuple[str, ...]:
        """Edge-set names needing padded-CSR row blocks (the
        materialization-free aggregation path of MessagePassingLayer,
        including its attention softmax); per_relation layers keep the
        bucketed-scan path."""
        if self.neighbor_block_size <= 0:
            return ()
        modes = set()
        for l in self.layers:
            if not isinstance(l, MessagePassingLayer) \
                    or l.propagation.startswith("per_relation"):
                continue
            if l.propagation == "direction":
                modes.update(("in", "out"))
            elif l.propagation == "single":
                modes.add("single_with_loops")
            elif l.propagation == "single_with_self_edge_weight":
                modes.add("single")
        return tuple(sorted(modes))

    def dense_adjacency_modes(self) -> Tuple[str, ...]:
        """Edge-set names whose aggregation can run as ONE dense
        [N, N] @ [N, d] matmul against a per-graph adjacency with the
        degree norm baked in (tpu.gnn_dense_adjacency). Requires a
        STATIC per-edge scale: hoistable composition (the mode weight
        commutes out), no attention, no learned relation weight, no
        edge/self-edge dropout; and for "sub" the node-level relation
        term (C @ rw) must be materializable so no per-edge rw
        subtraction remains. Empty tuple when ineligible or gated off."""
        mode = self.config.check(
            "tpu.gnn_dense_adjacency", ["auto", "always", "never"]
        )
        if mode == "never" or not self.layers:
            return ()
        reasons = []
        for l in self.layers:
            if not isinstance(l, MessagePassingLayer):
                reasons.append(f"{l.name}: not a message-passing layer")
                continue
            if l.propagation.startswith("per_relation"):
                reasons.append(f"{l.name}: per_relation propagation")
            if not l.hoistable:
                reasons.append(
                    f"{l.name}: composition {l.composition_name!r} does "
                    "not commute with the mode weight"
                )
            if l.attention:
                reasons.append(f"{l.name}: attention softmax is per-edge")
            if l.learned_relation_weight:
                reasons.append(f"{l.name}: learned relation weight is a "
                               "per-edge parameter")
            if l.edge_dropout > 0 or l.self_edge_dropout > 0:
                reasons.append(f"{l.name}: edge dropout makes the scale "
                               "per-step")
            if l.composition_name == "sub":
                R1 = l.num_relations + 1  # + loop relation
                if l.num_entities * R1 > l.C_MATRIX_MAX_ELEMENTS:
                    reasons.append(
                        f"{l.name}: 'sub' needs the C-matrix relation "
                        f"term, too large at N*R = "
                        f"{l.num_entities * R1}"
                    )
        if reasons:
            if mode == "always":
                raise ValueError(
                    "tpu.gnn_dense_adjacency=always is not applicable "
                    "here: " + "; ".join(reasons)
                )
            return ()
        modes = self.row_block_modes
        if mode == "auto":
            if jax.default_backend() == "cpu":
                return ()
            N = self.layers[0].num_entities
            dt = 4 if self.config.get(
                "tpu.gnn_dense_adjacency_dtype") == "float32" else 2
            limit = int(self.config.get(
                "tpu.gnn_dense_adjacency_limit_bytes"))
            if N * N * dt > limit:
                return ()
        return modes

    def init_params(self, rng) -> Dict[str, Any]:
        keys = jax.random.split(rng, len(self.layers))
        return {"layers": [l.init_params(k) for l, k in zip(self.layers, keys)]}

    def init_state(self) -> Dict[str, Any]:
        state: Dict[str, Any] = {}
        for l in self.layers:
            state.update(l.init_state())
        return state

    def apply(self, params, x, r, graph, ctx: Ctx):
        for layer, layer_params in zip(self.layers, params["layers"]):
            if self.layer_type == "torch_rgcn":
                x = self.activation(x)  # rgcn activates before the layer
            x, r = layer.apply(layer_params, x, r, graph, ctx)
            if self.layer_type in ("message_passing", "weighted_gcn"):
                x = self.activation(x)
            x = ctx.dropout(x, self.emb_entity_dropout)
        return x, r


class RgnnEncoder(KgeBase):
    """Runs the GNN over the whole graph and selects batch rows
    (reference: rgnn_encoder.py:1208-1328)."""

    def __init__(self, config: Config, dataset: Dataset,
                 configuration_key: str, entity_embedder, relation_embedder,
                 reciprocal_scorer: bool = False, init_for_load_only=False):
        super().__init__(config, dataset, configuration_key)
        self.entity_embedder = entity_embedder
        self.relation_embedder = relation_embedder
        self.reciprocal_scorer = reciprocal_scorer
        self.rgnn = Rgnn(config, dataset, configuration_key,
                         entity_embedder.dim)
        self.use_stale_embeddings = self.get_option("use_stale_embeddings")
        self._graph_np: Optional[Dict[str, np.ndarray]] = None
        self._halo_mesh = None  # set by prepare_job when vocab-sharded
        self.set_graph(None)

    def set_graph(self, triples: Optional[np.ndarray]):
        """(Re)build edge buffers; None means the full training split."""
        if triples is None:
            triples = self.dataset.split(self.config.get("train.split"))
        self._graph_np = build_graph_buffers(
            np.asarray(triples), self.dataset.num_relations(),
            self.rgnn.needs_rel_buckets,
            row_block_modes=self.rgnn.row_block_modes,
            block_size=self.rgnn.neighbor_block_size,
            num_entities=self.dataset.num_entities(),
        )
        self._maybe_build_halo()
        self._maybe_build_dense()

    def _maybe_build_halo(self):
        if self._halo_mesh is None or self._graph_np is None:
            return
        P = self._halo_mesh.shape["model"]
        modes = tuple(
            m for m in self.rgnn.row_block_modes
            if f"rb_{m}_nbr" in self._graph_np
        )
        if P > 1 and modes:
            self._graph_np.update(build_halo_structures(
                self._graph_np, modes, P,
                self.entity_embedder.padded_vocab_size,
            ))
            # model-sharded: the halo row-block path scales over the
            # mesh; drop any dense adjacency built for single-device
            for key in [k for k in self._graph_np
                        if k.startswith("dense_")]:
                del self._graph_np[key]

    def _maybe_build_dense(self):
        """Dense [N, N] adjacency per mode with the degree norm baked in
        (tpu.gnn_dense_adjacency; see MessagePassingLayer
        _row_block_aggregate). Built ON DEVICE with one jitted
        scatter-add per mode (shipping an N^2 host matrix over a
        remote-attached transport would cost seconds) and stored in the
        graph dict as a device array; graph() passes it through."""
        if self._graph_np is None or self._halo_mesh is not None:
            return
        for key in [k for k in self._graph_np if k.startswith("dense_")]:
            del self._graph_np[key]
        modes = self.rgnn.dense_adjacency_modes()
        if not modes:
            return
        from kge_tpu.ops.segment import degree_norm

        g = self._graph_np
        N = self.dataset.num_entities()
        dtype = (jnp.float32 if self.config.get(
            "tpu.gnn_dense_adjacency_dtype") == "float32"
            else jnp.bfloat16)
        use_norm = any(
            getattr(l, "use_edge_norm", False) for l in self.rgnn.layers
        )
        E = g["edge_index"].shape[1]
        loop = np.arange(N, dtype=np.int32)

        def edge_set(mode):
            ei = g["edge_index"]
            if mode == "in":
                return ei[0, : E // 2], ei[1, : E // 2]
            if mode == "out":
                return ei[0, E // 2:], ei[1, E // 2:]
            if mode == "single":
                return ei[0], ei[1]
            # single_with_loops: the self edges ride along, exactly as
            # apply()'s "" mode concatenates them
            return (np.concatenate([ei[0], loop]),
                    np.concatenate([ei[1], loop]))

        def build(src, nbr):
            ones = jnp.ones(src.shape[0], jnp.float32)
            # same scale apply() computes: symmetric degree norm over
            # the full mode edge set (masks are all-ones: eligibility
            # requires zero edge dropout), or the plain 0/1 mask
            scale = (degree_norm(src, nbr, ones, N)
                     if use_norm else ones)
            A = jnp.zeros((N, N), jnp.float32)
            return A.at[src, nbr].add(scale).astype(dtype)

        build = jax.jit(build)
        for mode in modes:
            src, nbr = edge_set(mode)
            self._graph_np[f"dense_{mode}"] = build(
                jnp.asarray(np.ascontiguousarray(src), jnp.int32),
                jnp.asarray(np.ascontiguousarray(nbr), jnp.int32),
            )

    def graph(self) -> Dict[str, jnp.ndarray]:
        g = {
            k: v if isinstance(v, int) else jnp.asarray(v)
            for k, v in self._graph_np.items()
        }
        if self._halo_mesh is not None and any(
                k.startswith("halo_") for k in g):
            g["halo_mesh"] = self._halo_mesh  # static (not an array)
        return g

    def init_params(self, rng):
        return self.rgnn.init_params(rng)

    def init_state(self):
        return self.rgnn.init_state()

    def encode(self, params, ctx: Ctx) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All contextualized entity + relation embeddings. With stale
        embeddings the forward is shared across all score calls of the
        current compiled step via the Ctx memo."""
        cache_key = f"{self.configuration_key}.encoded"
        if self.use_stale_embeddings and cache_key in ctx.cache:
            return ctx.cache[cache_key]
        x = self.entity_embedder.embed_all(params["entity_embedder"], ctx)
        r = self.relation_embedder.embed_all(params["relation_embedder"], ctx)
        x, r = self.rgnn.apply(params["encoder"], x, r, self.graph(), ctx)
        if not self.reciprocal_scorer:
            r = r[: self.dataset.num_relations()]
        ctx.cache[cache_key] = (x, r)
        return x, r

    def prepare_job(self, job, **kwargs):
        mesh = getattr(job, "mesh", None)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            self._halo_mesh = mesh
            self._maybe_build_halo()


class KgeRgnnModel(KgeModel):
    """Encoder-decoder composition: embedders -> R-GNN -> decoder scorer
    (reference: kge/model/kge_model.py:774-1066)."""

    def __init__(self, config: Config, dataset: Dataset,
                 configuration_key=None, init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        self.orig_num_relations = dataset.num_relations()

        # embedders over the doubled relation vocabulary (inverse edges)
        alt_dataset = dataset.shallow_copy()
        alt_dataset._num_relations = self.orig_num_relations * 2
        alt_dataset._meta = dict(dataset._meta)
        try:
            rel_ids = list(dataset.relation_ids())
            alt_dataset._meta["relation_ids"] = rel_ids + [
                f"{r}_reciprocal" for r in rel_ids
            ]
        except Exception:
            pass
        super().__init__(
            config, alt_dataset, scorer=None, create_embedders=True,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
        decoder_model = config.get(self.configuration_key + ".decoder.model")
        self.reciprocal_scorer = decoder_model == "reciprocal_relations_model"

        # build the decoder model to obtain its scorer
        self._decoder = KgeModel.create(
            config, dataset,
            configuration_key=self.configuration_key + ".decoder",
            init_for_load_only=init_for_load_only,
        )
        self._scorer = self._decoder.get_scorer()

        from kge_tpu.models.conve import ConvEScorer

        if isinstance(self._scorer, ConvEScorer):
            # the GNN's last layer must emit ConvE-sized entity embeddings
            scorer_dim = self._decoder.get_s_embedder().dim
            num_layers = config.get(
                self.configuration_key + ".encoder.num_layers"
            )
            config.set(
                f"{self.configuration_key}.encoder.{num_layers}_out_dim",
                scorer_dim, create=True,
            )
            rel_transform = config.get(
                self.configuration_key + ".encoder.rel_transformation"
            )
            if rel_transform == "self":
                # untransformed relations must already be ConvE-sized
                self._relation_embedder = self._decoder.get_p_embedder()

        self._encoder = RgnnEncoder(
            config, dataset,
            configuration_key=self.configuration_key + ".encoder",
            entity_embedder=self._entity_embedder,
            relation_embedder=self._relation_embedder,
            reciprocal_scorer=self.reciprocal_scorer,
            init_for_load_only=init_for_load_only,
        )

    # ------------------------------------------------------------------ params

    def init_params(self, rng):
        r_ent, r_rel, r_sc, r_enc = jax.random.split(rng, 4)
        return {
            "entity_embedder": self._entity_embedder.init_params(r_ent),
            "relation_embedder": self._relation_embedder.init_params(r_rel),
            "scorer": self._scorer.init_params(r_sc),
            "encoder": self._encoder.init_params(r_enc),
        }

    def init_state(self):
        return {**self._scorer.init_state(), **self._encoder.init_state()}

    def get_rgnn_encoder(self) -> RgnnEncoder:
        return self._encoder

    def supports_dot_ranking(self) -> bool:
        # dot-form ranking would bypass the encoder; use the generic path
        return False

    def set_graph(self, triples):
        self._encoder.set_graph(triples)

    def prepare_job(self, job, **kwargs):
        super().prepare_job(job, **kwargs)
        self._encoder.prepare_job(job, **kwargs)

    # ------------------------------------------------------------------ scoring

    def _encode(self, params, ctx: Ctx):
        return self._encoder.encode(params, ctx)

    def score_spo(self, params, s, p, o, direction=None, ctx=None):
        ctx = ctx or Ctx()
        if self.reciprocal_scorer:
            if direction == "s":
                p = p + self.orig_num_relations
            elif direction != "o":
                raise ValueError(
                    "reciprocal decoders cannot score undirected spo"
                )
        x, r = self._encode(params, ctx)
        s_emb = jnp.take(x, s, axis=0)
        p_emb = jnp.take(r, p, axis=0)
        o_emb = jnp.take(x, o, axis=0)
        return self._scorer.score_emb_spo(
            params["scorer"], s_emb, p_emb, o_emb, ctx
        )

    def score_sp(self, params, s, p, o_subset=None, ctx=None):
        ctx = ctx or Ctx()
        x, r = self._encode(params, ctx)
        s_emb = jnp.take(x, s, axis=0)
        p_emb = jnp.take(r, p, axis=0)
        o_emb = x if o_subset is None else jnp.take(x, o_subset, axis=0)
        return self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, o_emb, "sp_", ctx
        )

    def score_po(self, params, p, o, s_subset=None, ctx=None):
        ctx = ctx or Ctx()
        x, r = self._encode(params, ctx)
        s_emb = x if s_subset is None else jnp.take(x, s_subset, axis=0)
        o_emb = jnp.take(x, o, axis=0)
        if self.reciprocal_scorer:
            p_emb = jnp.take(r, p + self.orig_num_relations, axis=0)
            return self._scorer.score_emb(
                params["scorer"], o_emb, p_emb, s_emb, "sp_", ctx
            )
        p_emb = jnp.take(r, p, axis=0)
        return self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, o_emb, "_po", ctx
        )

    def score_so(self, params, s, o, p_subset=None, ctx=None):
        if self.reciprocal_scorer:
            raise ValueError("reciprocal decoders cannot score relations")
        ctx = ctx or Ctx()
        x, r = self._encode(params, ctx)
        s_emb = jnp.take(x, s, axis=0)
        o_emb = jnp.take(x, o, axis=0)
        p_emb = r if p_subset is None else jnp.take(r, p_subset, axis=0)
        return self._scorer.score_emb(
            params["scorer"], s_emb, p_emb, o_emb, "s_o", ctx
        )

    def score_sp_po(self, params, s, p, o, entity_subset=None, ctx=None):
        ctx = ctx or Ctx()
        x, r = self._encode(params, ctx)
        s_emb = jnp.take(x, s, axis=0)
        o_emb = jnp.take(x, o, axis=0)
        ents = x if entity_subset is None else jnp.take(x, entity_subset, axis=0)
        p_emb = jnp.take(r, p, axis=0)
        if self.reciprocal_scorer:
            p_inv = jnp.take(r, p + self.orig_num_relations, axis=0)
            sp_scores = self._scorer.score_emb(
                params["scorer"], s_emb, p_emb, ents, "sp_", ctx
            )
            po_scores = self._scorer.score_emb(
                params["scorer"], o_emb, p_inv, ents, "sp_", ctx
            )
        else:
            sp_scores = self._scorer.score_emb(
                params["scorer"], s_emb, p_emb, ents, "sp_", ctx
            )
            po_scores = self._scorer.score_emb(
                params["scorer"], ents, p_emb, o_emb, "_po", ctx
            )
        return jnp.concatenate([sp_scores, po_scores], axis=1)


class RGCN(KgeRgnnModel):
    pass


class WGCN(KgeRgnnModel):
    pass


class CompGCN(KgeRgnnModel):
    pass


class RAGAT(KgeRgnnModel):
    pass
