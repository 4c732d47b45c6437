"""Entity-ranking evaluation tests.

The compiled rank-counting path is checked against a brute-force numpy
referee implementing the reference's exact semantics: filtering by -inf
masking, tie counting with rtol/atol, rounded-mean tie policy, rank
histograms -> MRR / Hits@K.
"""

import numpy as np
import jax
import pytest

from kge_tpu import Dataset
from kge_tpu.evaluation.eval import EvaluationJob
from kge_tpu.models import Ctx, KgeModel

from tests.util import create_config, get_dataset_folder


def _setup(chunk_size=-1, model_name="complex"):
    config = create_config("dataset_test", model=model_name)
    config.set("job.type", "eval")
    config.set("eval.split", "test")
    config.set("lookup_embedder.dim", 16)
    config.set("entity_ranking.chunk_size", chunk_size)
    config.set("entity_ranking.hits_at_k_s", [1, 2, 3])
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(7))
    job = EvaluationJob.create(config, dataset, model=model)
    job.set_params(params, model.init_state())
    return config, dataset, model, params, job


def _brute_force_metrics(config, dataset, model, params, hits_ks=(1, 2, 3)):
    """Reference-semantics referee implementation."""
    E = dataset.num_entities()
    test = dataset.split("test")
    atol, rtol = 1e-5, 1e-4
    filter_splits = ["train", "valid", "test"]

    ctx = Ctx(state=model.init_state())
    import jax.numpy as jnp

    def final_rank(scores, true_score):
        close = np.abs(scores - true_score) <= atol + rtol * np.abs(true_score)
        greater = (scores > true_score) & ~close
        return greater.sum() + close.sum() // 2  # rounded_mean, 0-based

    answers_sp = {}
    answers_po = {}
    for split in filter_splits:
        for s, p, o in dataset.split(split):
            answers_sp.setdefault((s, p), set()).add(o)
            answers_po.setdefault((p, o), set()).add(s)

    ranks = {"raw": [], "filt": []}
    for s, p, o in test:
        sp_scores = np.asarray(
            model.score_sp(params, jnp.asarray([s]), jnp.asarray([p]), ctx=ctx)
        )[0]
        po_scores = np.asarray(
            model.score_po(params, jnp.asarray([p]), jnp.asarray([o]), ctx=ctx)
        )[0]
        o_true, s_true = sp_scores[o], po_scores[s]
        ranks["raw"].append(final_rank(sp_scores, o_true))
        ranks["raw"].append(final_rank(po_scores, s_true))
        sp_f = sp_scores.copy()
        sp_f[list(answers_sp[(s, p)])] = -np.inf
        po_f = po_scores.copy()
        po_f[list(answers_po[(p, o)])] = -np.inf
        ranks["filt"].append(final_rank(sp_f, o_true))
        ranks["filt"].append(final_rank(po_f, s_true))

    out = {}
    for kind, rank_list in ranks.items():
        r = np.asarray(rank_list) + 1  # 1-based
        suffix = "" if kind == "raw" else "_filtered"
        out["mean_reciprocal_rank" + suffix] = float(np.mean(1.0 / r))
        out["mean_rank" + suffix] = float(np.mean(r))
        for k in hits_ks:
            out[f"hits_at_{k}{suffix}"] = float(np.mean(r <= k))
    return out


@pytest.mark.parametrize("chunk_size", [-1, 3])
def test_entity_ranking_matches_brute_force(chunk_size):
    config, dataset, model, params, job = _setup(chunk_size)
    # test split is in filter_splits here -> no filtered_with_test variant
    config.set("entity_ranking.filter_splits", ["train", "valid", "test"])
    trace = job.run()
    expected = _brute_force_metrics(config, dataset, model, params)
    for key, value in expected.items():
        assert key in trace, key
        np.testing.assert_allclose(trace[key], value, rtol=1e-5, err_msg=key)


def test_filtered_with_test_variant():
    config, dataset, model, params, job = _setup()
    # default filter splits are train+valid(+eval split added) -> here we
    # force train/valid so the _filtered_with_test variant appears
    config.set("entity_ranking.filter_splits", ["train", "valid"])
    config.set("eval.split", "valid")
    job2 = EvaluationJob.create(config, dataset, model=model)
    job2.set_params(params, model.init_state())
    trace = job2.run()
    assert "mean_reciprocal_rank_filtered_with_test" in trace
    # filtering only removes competitors: filtered MRR >= raw MRR
    assert (trace["mean_reciprocal_rank_filtered"]
            >= trace["mean_reciprocal_rank"] - 1e-12)
    assert (trace["mean_reciprocal_rank_filtered_with_test"]
            >= trace["mean_reciprocal_rank_filtered"] - 1e-12)


def test_drilldown_metrics():
    config, dataset, model, params, job = _setup()
    config.set("entity_ranking.metrics_per.head_and_tail", True)
    config.set("entity_ranking.metrics_per.relation_type", True)
    config.set("entity_ranking.metrics_per.argument_frequency", True)
    job2 = EvaluationJob.create(config, dataset, model=model)
    job2.set_params(params, model.init_state())
    trace = job2.run()
    assert "mean_reciprocal_rank_filtered_head" in trace
    assert any(k.endswith("_1-1") or k.endswith("_1-N") or k.endswith("_M-1")
               or k.endswith("_M-N") for k in trace)
    assert "mean_reciprocal_rank_subject_top" in trace


@pytest.mark.parametrize("model_name", ["complex", "distmult", "rescal",
                                        "simple", "cp", "transe", "rotate"])
def test_fused_matches_generic(model_name):
    """The fused Pallas rank-count path must reproduce the generic
    chunked-masking path exactly — including the monotone L2-expansion
    dot form of the distance scorers (transe l_norm=2, rotate)."""
    traces = {}
    for impl in ("generic", "fused"):
        config, dataset, model, params, job = _setup(model_name=model_name)
        if model_name in ("rotate", "transe"):
            # both default to the reference's l_norm 1.0, which has no
            # dot form; the fused path needs the L2 expansion
            config.set(f"{model_name}.l_norm", 2.0)
            from kge_tpu import Dataset as _DS
            dataset = _DS.create(config, get_dataset_folder("dataset_test"))
            model = KgeModel.create(config, dataset)
        if impl == "fused":
            assert model.supports_dot_ranking(), model_name
        config.set("entity_ranking.implementation", impl)
        config.set("entity_ranking.chunk_size", 3)
        job2 = EvaluationJob.create(config, dataset, model=model)
        # identical params across runs
        import jax as _jax
        params = model.init_params(_jax.random.PRNGKey(123))
        job2.set_params(params, model.init_state())
        traces[impl] = job2.run()
    for key in traces["generic"]:
        if key.startswith(("mean_", "hits_")):
            np.testing.assert_allclose(
                traces["generic"][key], traces["fused"][key],
                rtol=1e-6, err_msg=key,
            )


@pytest.mark.parametrize("base", ["complex", "distmult"])
def test_fused_matches_generic_reciprocal(base):
    """Reciprocal-wrapped bilinear models (the reference's most common
    recipe shape) must run the fused path under auto and reproduce the
    generic metrics (round-1 verdict bug #1: dot_candidates lacked the
    sides kwarg and crashed)."""
    traces = {}
    for impl in ("generic", "fused"):
        config = create_config("dataset_test", model=base)
        config._import("reciprocal_relations_model")
        config.set("reciprocal_relations_model.base_model.type", base)
        config.set("model", "reciprocal_relations_model")
        config.set("job.type", "eval")
        config.set("eval.split", "test")
        config.set("lookup_embedder.dim", 16)
        config.set("entity_ranking.chunk_size", 3)
        config.set("entity_ranking.implementation", impl)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        model = KgeModel.create(config, dataset)
        if impl == "fused":
            assert model.supports_dot_ranking()
        job = EvaluationJob.create(config, dataset, model=model)
        job.set_params(model.init_params(jax.random.PRNGKey(123)),
                       model.init_state())
        traces[impl] = job.run()
    for key in traces["generic"]:
        if key.startswith(("mean_", "hits_")):
            np.testing.assert_allclose(
                traces["generic"][key], traces["fused"][key],
                rtol=1e-6, err_msg=key,
            )


@pytest.mark.parametrize("base", ["conve", "transformer"])
def test_fused_matches_generic_reciprocal_feature_scorers(base):
    """ConvE/Transformer expose an sp_-only dot form (features . raw
    candidate rows, bias in dim 0 for ConvE), so their standard
    reciprocal-wrapped configuration runs fused under auto and must
    reproduce the generic metrics. Their BARE models must NOT take the
    fused path (no _po dot form)."""
    traces = {}
    for impl in ("generic", "fused"):
        config = create_config("dataset_test", model=base)
        config._import("reciprocal_relations_model")
        config.set("reciprocal_relations_model.base_model.type", base)
        config.set("model", "reciprocal_relations_model")
        config.set("job.type", "eval")
        config.set("eval.split", "test")
        if base == "conve":
            config.set("conve.round_dim", True)
            config.set("conve.entity_embedder.dim", 32, create=True)
            config.set("conve.relation_embedder.dim", 32, create=True)
        else:
            config.set("transformer.entity_embedder.dim", 16, create=True)
            config.set("transformer.relation_embedder.dim", 16, create=True)
        config.set("entity_ranking.chunk_size", 3)
        config.set("entity_ranking.implementation", impl)
        dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
        model = KgeModel.create(config, dataset)
        if impl == "fused":
            assert model.supports_dot_ranking()
            assert not model._base_model.supports_dot_ranking()
        job = EvaluationJob.create(config, dataset, model=model)
        job.set_params(model.init_params(jax.random.PRNGKey(1)),
                       model.init_state())
        traces[impl] = job.run()
    for key in traces["generic"]:
        if key.startswith(("mean_", "hits_")):
            np.testing.assert_allclose(
                traces["generic"][key], traces["fused"][key],
                rtol=1e-6, err_msg=key,
            )


def test_metric_expr_computes_missing_metric():
    """valid.metric_expr is eval'd when the configured metric is absent
    (reference: kge/job/eval.py:69-76)."""
    from kge_tpu import Dataset
    from kge_tpu.evaluation.eval import EvaluationJob
    from kge_tpu.models import KgeModel
    import jax

    config = create_config("dataset_test", model="complex")
    config.set("console.quiet", True)
    config.set("lookup_embedder.dim", 8)
    config.set("job.type", "eval")
    config.set("eval.split", "test")
    config.set("valid.metric", "my_combined_metric")
    config.set(
        "valid.metric_expr",
        "0.5 * mean_reciprocal_rank_filtered + 0.5 * hits_at_3_filtered",
    )
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    job = EvaluationJob.create(config, dataset, model=model)
    job.set_params(model.init_params(jax.random.PRNGKey(0)), model.init_state())
    job.verbose = False
    entry = job._run()
    expected = (0.5 * entry["mean_reciprocal_rank_filtered"]
                + 0.5 * entry["hits_at_3_filtered"])
    assert abs(entry["my_combined_metric"] - expected) < 1e-12


def test_training_loss_eval():
    """eval.type: training_loss reports forward-only avg_loss
    (reference: kge/job/eval_training_loss.py)."""
    from kge_tpu import Dataset
    from kge_tpu.evaluation.eval import EvaluationJob
    from kge_tpu.models import KgeModel
    import jax

    config = create_config("dataset_test", model="complex")
    config.set("console.quiet", True)
    config.set("lookup_embedder.dim", 8)
    config.set("job.type", "eval")
    config.set("eval.type", "training_loss")
    config.set("eval.split", "valid")
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    job = EvaluationJob.create(config, dataset, model=model)
    job.set_params(model.init_params(jax.random.PRNGKey(0)), model.init_state())
    job.verbose = False
    entry = job._run()
    assert "avg_loss" in entry and entry["avg_loss"] > 0


def test_nan_scores_rank_last_not_first():
    """A NaN-scoring model must not report perfect MRR: NaN true scores
    sanitize to -inf and tie with every (-inf) candidate, yielding
    mid-range rounded-mean ranks in BOTH eval implementations."""
    import jax.numpy as jnp

    for impl in ("generic", "fused"):
        config, dataset, model, params, job = _setup(model_name="complex")
        config.set("entity_ranking.implementation", impl)
        params = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, jnp.nan), params
        )
        job = EvaluationJob.create(config, dataset, model=model)
        job.set_params(params, model.init_state())
        job.verbose = False
        entry = job._run()
        E = dataset.num_entities()
        # every entity ties (incl. the true answer): rounded-mean rank =
        # ties//2 + 1 (reference tie semantics)
        expected = 1.0 / (E // 2 + 1)
        assert abs(entry["mean_reciprocal_rank"] - expected) < 1e-9, impl
