"""R-GNN encoder tests: all four presets train end-to-end on the tiny
fixture; RGCN (non-reciprocal decoder) passes the score-form consistency
invariant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kge_tpu import Dataset
from kge_tpu.models import Ctx, KgeModel
from kge_tpu.train.train import TrainingJob

from tests.util import create_config, get_dataset_folder
pytestmark = pytest.mark.slow  # 8-device / long-training tests; fast profile: -m 'not slow'

RGNN_MODELS = ["rgcn", "wgcn", "compgcn", "ragat"]


def _make_config(model_name, extra=None):
    config = create_config("dataset_test", model=model_name)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 4)
    config.set("train.max_epochs", 1)
    config.set("valid.every", 0)
    config.set("random_seed.default", 7)
    # small dims for speed
    config.set(f"{model_name}.entity_embedder.dim", 16, create=True)
    config.set(f"{model_name}.relation_embedder.dim", 16, create=True)
    if model_name == "rgcn":
        config.set("rgcn.encoder.num_blocks_or_bases", 4)
    # shrink the ConvE decoder for the reciprocal presets
    if model_name in ("wgcn", "compgcn", "ragat"):
        config.set(
            f"{model_name}.decoder.base_model.entity_embedder.dim", 32,
            create=True,
        )
        config.set(
            f"{model_name}.decoder.base_model.relation_embedder.dim", 32,
            create=True,
        )
    for key, value in (extra or {}).items():
        config.set(key, value, create=True)
    return config


@pytest.mark.parametrize("model_name", RGNN_MODELS)
def test_rgnn_trains_one_epoch(model_name):
    config = _make_config(model_name)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    job = TrainingJob.create(config, dataset)
    trace = job.run()
    assert np.isfinite(trace["avg_loss"]), model_name


def test_rgcn_score_form_consistency():
    config = _make_config("rgcn")
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(3))
    state = model.init_state()
    E = dataset.num_entities()
    R = dataset.num_relations()
    s, p, o = np.meshgrid(
        np.arange(E), np.arange(R), np.arange(E), indexing="ij"
    )
    spo = np.asarray(
        model.score_spo(
            params, jnp.asarray(s.reshape(-1)), jnp.asarray(p.reshape(-1)),
            jnp.asarray(o.reshape(-1)), direction="o", ctx=Ctx(state=state),
        )
    ).reshape(E, R, E)
    ss, pp = np.meshgrid(np.arange(E), np.arange(R), indexing="ij")
    sp = np.asarray(
        model.score_sp(
            params, jnp.asarray(ss.reshape(-1)), jnp.asarray(pp.reshape(-1)),
            ctx=Ctx(state=state),
        )
    ).reshape(E, R, E)
    np.testing.assert_allclose(spo, sp, rtol=1e-4, atol=1e-4)


def test_compgcn_eval_runs():
    from kge_tpu.evaluation.eval import EvaluationJob

    config = _make_config("compgcn")
    config.set("job.type", "eval")
    config.set("eval.split", "test")
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(5))
    job = EvaluationJob.create(config, dataset, model=model)
    job.set_params(params, model.init_state())
    trace = job.run()
    assert "mean_reciprocal_rank_filtered" in trace
    assert 0.0 <= trace["mean_reciprocal_rank_filtered"] <= 1.0


def test_graph_sampling_epoch():
    config = _make_config(
        "compgcn",
        extra={
            "negative_sampling.graph_sampling": "uniform",
            "negative_sampling.graph_sampling_size": 4,
        },
    )
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    job = TrainingJob.create(config, dataset)
    trace = job.run()
    assert np.isfinite(trace["avg_loss"])


def test_row_block_aggregation_matches_scatter():
    """neighbor_block_size > 0 (padded-CSR accumulated gathers) must
    reproduce the gather->segment_sum path exactly, across propagation
    modes and compositions."""
    import numpy as np
    import jax

    from kge_tpu import Dataset
    from kge_tpu.models import Ctx, KgeModel
    from tests.util import create_config, get_dataset_folder

    for propagation, composition in [
        ("direction", "sub"),
        ("direction", "mult"),
        ("single", "neighbor"),
        ("single_with_self_edge_weight", "cross"),
    ]:
        outs = []
        for block in (0, 4):
            config = create_config("dataset_test", model="compgcn")
            config.set("compgcn.encoder.message_passing_args.propagation",
                       propagation)
            config.set("compgcn.encoder.message_passing_args.composition",
                       composition)
            config.set("compgcn.encoder.neighbor_block_size", block,
                       create=True)
            config.set("compgcn.entity_embedder.dim", 16, create=True)
            config.set("compgcn.relation_embedder.dim", 16, create=True)
            config.set(
                "compgcn.decoder.base_model.entity_embedder.dim", 16,
                create=True)
            config.set(
                "compgcn.decoder.base_model.relation_embedder.dim", 16,
                create=True)
            dataset = Dataset.create(
                config, get_dataset_folder("dataset_test"))
            model = KgeModel.create(config, dataset)
            params = model.init_params(jax.random.PRNGKey(3))
            ctx = Ctx(train=False, state=model.init_state())
            s = jax.numpy.asarray([0, 1])
            p = jax.numpy.asarray([0, 1])
            scores = model.score_sp(params, s, p, ctx=ctx)
            outs.append(np.asarray(scores))
        np.testing.assert_allclose(
            outs[0], outs[1], rtol=2e-5, atol=1e-5,
            err_msg=f"{propagation}/{composition}",
        )


def test_dense_adjacency_matches_row_blocks():
    """tpu.gnn_dense_adjacency=always (one [N, N] matmul per mode with
    the degree norm baked in) must reproduce the row-block aggregation's
    scores AND gradients across qualifying propagation modes; the
    eligibility gate must reject per-edge-scale configurations."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest

    from kge_tpu import Dataset
    from kge_tpu.models import Ctx, KgeModel
    from tests.util import create_config, get_dataset_folder

    def make(dense, propagation="direction", composition="sub",
             edge_norm=True, extra=None):
        config = create_config("dataset_test", model="compgcn")
        config.set("compgcn.encoder.message_passing_args.propagation",
                   propagation)
        config.set("compgcn.encoder.message_passing_args.composition",
                   composition)
        config.set("compgcn.encoder.message_passing_args.edge_norm",
                   edge_norm)
        config.set("tpu.gnn_dense_adjacency", dense)
        for key, v in (extra or {}).items():
            config.set(key, v)
        for key in ("compgcn.entity_embedder.dim",
                    "compgcn.relation_embedder.dim",
                    "compgcn.decoder.base_model.entity_embedder.dim",
                    "compgcn.decoder.base_model.relation_embedder.dim"):
            config.set(key, 16, create=True)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        return KgeModel.create(config, dataset)

    for propagation, composition, edge_norm in [
        ("direction", "sub", True),
        ("direction", "neighbor", False),
        ("single", "neighbor", True),
        ("single_with_self_edge_weight", "sub", False),
    ]:
        grads, scores = [], []
        for dense in ("never", "always"):
            model = make(dense, propagation, composition, edge_norm)
            graph = model.get_rgnn_encoder()._graph_np
            has_dense = any(k.startswith("dense_") for k in graph)
            assert has_dense == (dense == "always"), (propagation, dense)
            params = model.init_params(jax.random.PRNGKey(3))

            def loss(params):
                ctx = Ctx(train=False, state=model.init_state())
                sc = model.score_sp(
                    params, jnp.asarray([0, 1]), jnp.asarray([0, 1]),
                    ctx=ctx,
                )
                return jnp.sum(sc ** 2), sc

            (value, sc), g = jax.value_and_grad(loss, has_aux=True)(params)
            scores.append(np.asarray(sc))
            grads.append(g)
        np.testing.assert_allclose(
            scores[0], scores[1], rtol=2e-5, atol=1e-5,
            err_msg=f"{propagation}/{composition}",
        )
        for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                        jax.tree_util.tree_leaves(grads[1])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=f"{propagation}/{composition}",
            )

    # eligibility: per-edge scale (edge dropout / attention / learned
    # alpha) must raise under always...
    for extra in (
        {"compgcn.encoder.edge_dropout": 0.5},
        {"compgcn.encoder.message_passing_args.attention": True},
        {"compgcn.encoder.message_passing_args.learned_relation_weight":
         True},
    ):
        with pytest.raises(ValueError, match="gnn_dense_adjacency"):
            make("always", extra=extra)
    # ...and auto stays off on CPU (and for ineligible configs)
    model = make("auto")
    assert not any(
        k.startswith("dense_")
        for k in model.get_rgnn_encoder()._graph_np
    )


def test_row_block_gradients_match_scatter():
    """The custom symmetric backward (transpose row blocks) must
    reproduce autodiff's gradients wrt entity/relation tables and layer
    weights, with edge_norm on and off."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kge_tpu import Dataset
    from kge_tpu.models import Ctx, KgeModel
    from tests.util import create_config, get_dataset_folder

    for edge_norm in (True, False):
        grads = []
        for block in (0, 4):
            config = create_config("dataset_test", model="compgcn")
            config.set("compgcn.encoder.message_passing_args.edge_norm",
                       edge_norm)
            config.set("compgcn.encoder.neighbor_block_size", block,
                       create=True)
            config.set("compgcn.entity_embedder.dim", 16, create=True)
            config.set("compgcn.relation_embedder.dim", 16, create=True)
            config.set(
                "compgcn.decoder.base_model.entity_embedder.dim", 16,
                create=True)
            config.set(
                "compgcn.decoder.base_model.relation_embedder.dim", 16,
                create=True)
            dataset = Dataset.create(
                config, get_dataset_folder("dataset_test"))
            model = KgeModel.create(config, dataset)
            params = model.init_params(jax.random.PRNGKey(3))

            def loss(params):
                ctx = Ctx(train=False, state=model.init_state())
                s = jnp.asarray([0, 1])
                p = jnp.asarray([0, 1])
                return jnp.sum(model.score_sp(params, s, p, ctx=ctx) ** 2)

            grads.append(jax.grad(loss)(params))
        flat0 = jax.tree_util.tree_leaves(grads[0])
        flat1 = jax.tree_util.tree_leaves(grads[1])
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=f"edge_norm={edge_norm}",
            )


def test_row_block_attention_matches_concat_path():
    """The row-block attention softmax (no [E, d] message buffer) must
    reproduce the legacy concat-then-softmax path exactly — values and
    gradients — across propagation modes, compositions and heads."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kge_tpu import Dataset
    from kge_tpu.models import Ctx, KgeModel
    from tests.util import create_config, get_dataset_folder

    for propagation, composition, heads, mw in [
        ("direction", "cross_weighted", 2, True),   # RAGAT preset shape
        ("direction", "mult", 1, False),
        ("single", "neighbor", 1, False),
        ("single_with_self_edge_weight", "sub", 2, False),
    ]:
        outs, grads = [], []
        for block in (0, 4):
            config = create_config("dataset_test", model="compgcn")
            mp = "compgcn.encoder.message_passing_args"
            config.set(f"{mp}.propagation", propagation)
            config.set(f"{mp}.composition", composition)
            config.set(f"{mp}.attention", True)
            config.set(f"{mp}.num_heads", heads)
            config.set(f"{mp}.message_weight", mw)
            config.set("compgcn.encoder.neighbor_block_size", block,
                       create=True)
            for key in (
                "compgcn.entity_embedder.dim",
                "compgcn.relation_embedder.dim",
                "compgcn.decoder.base_model.entity_embedder.dim",
                "compgcn.decoder.base_model.relation_embedder.dim",
            ):
                config.set(key, 16, create=True)
            dataset = Dataset.create(
                config, get_dataset_folder("dataset_test"))
            model = KgeModel.create(config, dataset)
            params = model.init_params(jax.random.PRNGKey(3))

            def loss(params):
                ctx = Ctx(train=False, state=model.init_state())
                s = jnp.asarray([0, 1])
                p = jnp.asarray([0, 1])
                return jnp.sum(model.score_sp(params, s, p, ctx=ctx) ** 2)

            ctx = Ctx(train=False, state=model.init_state())
            outs.append(np.asarray(model.score_sp(
                params, jnp.asarray([0, 1]), jnp.asarray([0, 1]), ctx=ctx)))
            grads.append(jax.grad(loss)(params))
        tag = f"{propagation}/{composition}/h{heads}"
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=1e-5,
                                   err_msg=tag)
        for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                        jax.tree_util.tree_leaves(grads[1])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=tag,
            )


def test_ragat_trains_with_row_blocks():
    """One RAGAT epoch through the full job with row blocks on (train
    mode exercises the per-entry dropout draw in the rb softmax)."""
    config = _make_config("ragat")
    config.set("ragat.encoder.neighbor_block_size", 4, create=True)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    job = TrainingJob.create(config, dataset)
    trace = job.run()
    assert np.isfinite(trace["avg_loss"])


def test_rel_bucket_padding_bounded_on_skewed_graphs():
    """Adaptive bucket width must keep per-relation scan padding under
    1.5x the edge count when the relation distribution is skewed (one
    hot relation + a long tail of rare ones)."""
    from kge_tpu.models.rgnn.encoder import build_graph_buffers

    rng = np.random.default_rng(0)
    num_rel = 120
    # relation 0: 20k edges; the rest: 1-4 edges each
    tail = [
        np.stack([
            rng.integers(0, 500, size=n),
            np.full(n, r),
            rng.integers(0, 500, size=n),
        ], axis=1)
        for r, n in zip(range(1, num_rel),
                        rng.integers(1, 5, size=num_rel - 1))
    ]
    hot = np.stack([
        rng.integers(0, 500, size=20000),
        np.zeros(20000, np.int64),
        rng.integers(0, 500, size=20000),
    ], axis=1)
    triples = np.concatenate([hot] + tail).astype(np.int64)
    graph = build_graph_buffers(triples, num_rel, per_relation=True,
                                num_entities=500)
    E = graph["edge_index"].shape[1]
    padded = graph["rel_buckets"].size
    assert padded / E < 1.5, f"padding factor {padded / E:.2f}"


def test_wgcn_alpha_padding_row_zero_and_frozen():
    """torch declares WGCN's alpha as Embedding(padding_idx=0)
    (reference rgnn_encoder.py:938): row 0 starts at zero, receives no
    gradient, and relation 0's forward edges contribute nothing."""
    from kge_tpu.models.rgnn.layers import WeightedGCNLayer

    config = _make_config("wgcn")
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(5))
    state = model.init_state()
    layer0 = params["encoder"]["layers"][0]
    assert np.allclose(np.asarray(layer0["alpha"])[0], 0.0)

    def loss(p):
        scores = model.score_sp(
            p, jnp.asarray([0, 1]), jnp.asarray([0, 1]),
            ctx=Ctx(state=state),
        )
        return jnp.sum(scores ** 2)

    g = jax.grad(loss)(params)
    g0 = np.asarray(g["encoder"]["layers"][0]["alpha"])
    assert np.allclose(g0[0], 0.0), "padding row received gradient"
    assert np.abs(g0[1:]).sum() > 0, "non-padding alpha rows have no grad"


def test_row_blocks_native_matches_numpy():
    """The native O(E) counting-sort graph-buffer builder must be
    BITWISE identical to the numpy argsort path (stability contract
    included) across modes, skew, and edge cases."""
    import unittest.mock as mock

    import kge_tpu.native as native
    from kge_tpu.models.rgnn import encoder as enc_mod

    try:
        native._lib()
    except RuntimeError:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(13)
    cases = [
        (0, 5, 3),       # empty graph
        (1, 1, 1),       # single node self-ish edge
        (2000, 11, 4),   # heavy hubs (few nodes)
        (5000, 700, 9),  # sparse
    ]
    for E, V, R in cases:
        triples = np.stack([
            rng.integers(0, V, E), rng.integers(0, R, E),
            rng.integers(0, V, E),
        ], axis=1).astype(np.int64)
        for modes in [("in", "out"), ("single",), ("single_with_loops",)]:
            a = enc_mod.build_graph_buffers(
                triples, R, per_relation=True, row_block_modes=modes,
                block_size=8, num_entities=V,
            )
            with mock.patch.object(native, "counting_argsort_native",
                                   side_effect=RuntimeError), \
                 mock.patch.object(native, "row_blocks_with_transpose_native",
                                   side_effect=RuntimeError), \
                 mock.patch.object(native, "row_blocks_native",
                                   side_effect=RuntimeError):
                b = enc_mod.build_graph_buffers(
                    triples, R, per_relation=True, row_block_modes=modes,
                    block_size=8, num_entities=V,
                )
            assert set(a) == set(b)
            for k in a:
                if isinstance(a[k], int):
                    assert a[k] == b[k], (E, modes, k)
                else:
                    assert np.array_equal(a[k], b[k]), (E, modes, k)


def test_attention_dropped_edges_leave_softmax():
    """Edge-dropped entries (scale 0) must contribute NOTHING to the
    attention softmax denominator (the reference removes dropped edges
    from edge_index entirely); a zeroed message still scores
    -leaky_relu(0)=0, so counting it would add exp(0)=1 per dropped
    edge. Referee: numpy softmax over only the live entries."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kge_tpu import Dataset
    from kge_tpu.models import Ctx, KgeModel
    from tests.util import create_config, get_dataset_folder

    config = create_config("dataset_test", model="ragat")
    mp = "ragat.encoder.message_passing_args"
    config.set(f"{mp}.attention", True)
    for key in (
        "ragat.entity_embedder.dim", "ragat.relation_embedder.dim",
        "ragat.decoder.base_model.entity_embedder.dim",
        "ragat.decoder.base_model.relation_embedder.dim",
    ):
        config.set(key, 16, create=True)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(3))
    layer = model._encoder.rgnn.layers[0]
    lp = params["encoder"]["layers"][0]

    rng = np.random.default_rng(0)
    N, K = 4, 3
    d_in = layer.in_dim
    tab = jnp.asarray(rng.standard_normal((N, d_in)), jnp.float32)
    r_full = jnp.asarray(
        rng.standard_normal((dataset.num_relations() * 2 + 1, d_in)),
        jnp.float32,
    )
    node = jnp.asarray([0, 1])
    nbr = jnp.asarray([[1, 2, 3], [0, 2, 3]])
    types = jnp.asarray([[0, 1, 0], [1, 0, 1]])
    # entry (0,1): edge-dropped (pos valid, scale 0)
    # entry (1,2): padding (pos -1)
    pos = jnp.asarray([[0, 1, 2], [3, 4, -1]])
    sc = jnp.asarray([1.0, 0.0, 1.0, 1.0, 1.0])
    weight = lp["w_in_h0"]
    att_w = lp["w_att_h0"]
    mw = lp.get("w_msgweight_h0") if layer.message_weight else None
    alpha = lp.get("alpha") if layer.learned_relation_weight else None
    num, den = layer._attention_accumulate(
        tab, node, nbr, types, pos, sc, r_full, weight, att_w, mw, alpha,
        None,
    )
    num, den = np.asarray(num), np.asarray(den)

    # numpy referee over live entries only
    for row in range(2):
        exp_num = np.zeros(layer.out_dim)
        exp_den = 0.0
        for k in range(K):
            p_ = int(pos[row, k])
            if p_ < 0 or float(sc[p_]) == 0.0:
                continue
            h_i = np.asarray(tab)[int(node[row])]
            h_j = np.asarray(tab)[int(nbr[row, k])]
            h_r = np.asarray(r_full)[int(types[row, k])]
            mw_k = (np.asarray(mw)[int(types[row, k])]
                    if mw is not None else None)
            m = np.asarray(layer.composition(
                jnp.asarray(h_i)[None], jnp.asarray(h_j)[None],
                jnp.asarray(h_r)[None],
                jnp.asarray(mw_k)[None] if mw_k is not None else None,
            ))[0] @ np.asarray(weight)
            if alpha is not None:
                m = m * np.asarray(alpha)[int(types[row, k])]
            m = m * float(sc[p_])
            z = float(m @ np.asarray(att_w))
            score = -(z if z > 0 else 0.2 * z)
            e = np.exp(score)
            exp_num = exp_num + e * m
            exp_den = exp_den + e
        np.testing.assert_allclose(num[row], exp_num, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(den[row, 0], exp_den, rtol=1e-5)


def test_per_relation_propagation_dropout_engages():
    """emb_propagation_dropout must not be a silent no-op on the
    per_relation path (the reference prop_drops every relation's
    aggregated message). Train-mode forwards with dropout>0 must vary
    with the rng and average back to the undropped forward (unbiased
    1/keep scaling)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from kge_tpu import Dataset
    from kge_tpu.models import Ctx, KgeModel
    from tests.util import create_config, get_dataset_folder

    config = create_config("dataset_test", model="compgcn")
    mp = "compgcn.encoder.message_passing_args"
    config.set(f"{mp}.propagation", "per_relation")
    config.set("compgcn.encoder.weight_decomposition", "basis")
    config.set("compgcn.encoder.num_blocks_or_bases", 2)
    config.set(f"{mp}.emb_propagation_dropout", 0.5)
    config.set(f"{mp}.edge_dropout", 0.0)
    config.set(f"{mp}.self_edge_dropout", 0.0)
    for key in (
        "compgcn.entity_embedder.dim", "compgcn.relation_embedder.dim",
        "compgcn.decoder.base_model.entity_embedder.dim",
        "compgcn.decoder.base_model.relation_embedder.dim",
    ):
        config.set(key, 16, create=True)
    config.set("compgcn.encoder.use_stale_embeddings", False)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(3))
    layer = model._encoder.rgnn.layers[0]
    lp = params["encoder"]["layers"][0]
    graph = model._encoder.graph()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, layer.in_dim)),
        jnp.float32,
    )
    r_full = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (dataset.num_relations() * 2 + 1, layer.in_dim)),
        jnp.float32,
    )
    edge_mask = jnp.ones(graph["edge_index"].shape[1], jnp.float32)

    graph_j = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
               for k, v in graph.items()}

    @jax.jit
    def fwd_train(key):
        ctx = Ctx(train=True, rng=key, state=model.init_state())
        return layer._per_relation_out(lp, x, r_full, graph_j, edge_mask,
                                       ctx)

    ctx0 = Ctx(train=False, state=model.init_state())
    base = np.asarray(layer._per_relation_out(
        lp, x, r_full, graph_j, edge_mask, ctx0))
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    draws = np.stack([np.asarray(fwd_train(k)) for k in keys])
    # dropout actually engages (train draws differ from eval and vary)
    assert not np.allclose(draws[0], base)
    assert not np.allclose(draws[0], draws[1])
    # unbiased: mean over draws approaches the undropped output
    err = np.abs(draws.mean(axis=0) - base)
    scale = np.abs(base).mean() + 1e-6
    assert err.mean() < 0.15 * scale, (err.mean(), scale)
