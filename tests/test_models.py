"""Model zoo tests.

The central invariant (mirroring the reference test strategy,
tests/test_model.py:29-71): for every model, scoring the full E x R x E
cross product triple-wise (``score_spo``) must match the matrix forms
``score_sp`` / ``score_po`` / ``score_so`` (where supported).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kge_tpu import Dataset
from kge_tpu.models import KgeModel, Ctx

from tests.util import create_config, get_dataset_folder

BASE_MODELS = [
    "complex",
    "distmult",
    "transe",
    "rescal",
    "cp",
    "simple",
    "rotate",
    "transh",
    "relational_tucker3",
]
RECIPROCAL_MODELS = ["conve", "transformer", "complex"]


def _make_model(model_name, wrap_reciprocal=False):
    config = create_config("dataset_test", model=model_name)
    config.set("lookup_embedder.dim", 32)
    if wrap_reciprocal:
        config._import("reciprocal_relations_model")
        config.set("reciprocal_relations_model.base_model.type", model_name)
        config.set("model", "reciprocal_relations_model")
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(42))
    state = model.init_state()
    return model, params, state


def _all_triples(E, R):
    s, p, o = np.meshgrid(np.arange(E), np.arange(R), np.arange(E), indexing="ij")
    return s.reshape(-1), p.reshape(-1), o.reshape(-1)


@pytest.mark.parametrize("model_name", BASE_MODELS)
def test_score_form_consistency(model_name):
    model, params, state = _make_model(model_name)
    E = model.dataset.num_entities()
    R = model.dataset.num_relations()
    s, p, o = _all_triples(E, R)
    ctx = Ctx(state=state)
    spo = np.asarray(model.score_spo(params, jnp.asarray(s), jnp.asarray(p),
                                     jnp.asarray(o), ctx=Ctx(state=state)))
    spo = spo.reshape(E, R, E)

    # score_sp over all (s, p) pairs vs all entities
    ss, pp = np.meshgrid(np.arange(E), np.arange(R), indexing="ij")
    sp = np.asarray(
        model.score_sp(params, jnp.asarray(ss.reshape(-1)),
                       jnp.asarray(pp.reshape(-1)), ctx=Ctx(state=state))
    ).reshape(E, R, E)
    np.testing.assert_allclose(spo, sp, rtol=1e-4, atol=1e-4)

    # score_po over all (p, o) pairs vs all entities
    pp2, oo = np.meshgrid(np.arange(R), np.arange(E), indexing="ij")
    po = np.asarray(
        model.score_po(params, jnp.asarray(pp2.reshape(-1)),
                       jnp.asarray(oo.reshape(-1)), ctx=Ctx(state=state))
    ).reshape(R, E, E)  # [queries=(p,o), candidates=s]
    po_spo = np.transpose(spo, (1, 2, 0))
    np.testing.assert_allclose(po_spo, po, rtol=1e-4, atol=1e-4)

    # score_so over all (s, o) pairs vs all relations
    ss2, oo2 = np.meshgrid(np.arange(E), np.arange(E), indexing="ij")
    so = np.asarray(
        model.score_so(params, jnp.asarray(ss2.reshape(-1)),
                       jnp.asarray(oo2.reshape(-1)), ctx=Ctx(state=state))
    ).reshape(E, E, R)
    so_spo = np.transpose(spo, (0, 2, 1))
    np.testing.assert_allclose(so_spo, so, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model_name", RECIPROCAL_MODELS)
def test_reciprocal_score_sp_po(model_name):
    model, params, state = _make_model(model_name, wrap_reciprocal=True)
    E = model.dataset.num_entities()
    s = jnp.asarray([0, 1])
    p = jnp.asarray([0, 2])
    o = jnp.asarray([1, 3])
    scores = np.asarray(
        model.score_sp_po(params, s, p, o, ctx=Ctx(state=state))
    )
    assert scores.shape == (2, 2 * E)
    # sp-part must match score_spo(direction="o")
    for j in range(E):
        spo = np.asarray(
            model.score_spo(params, s, p, jnp.asarray([j, j]), direction="o",
                            ctx=Ctx(state=state))
        )
        np.testing.assert_allclose(scores[:, j], spo, rtol=1e-4, atol=1e-4)
    # po-part must match score_spo(direction="s")
    for j in range(E):
        spo = np.asarray(
            model.score_spo(params, jnp.asarray([j, j]), p, o, direction="s",
                            ctx=Ctx(state=state))
        )
        np.testing.assert_allclose(scores[:, E + j], spo, rtol=1e-4, atol=1e-4)


def test_rotate_phase_normalization_preserves_scores():
    model, params, state = _make_model("rotate")
    E = model.dataset.num_entities()
    R = model.dataset.num_relations()
    s, p, o = _all_triples(E, R)
    # blow phases out of range, then normalize
    params["relation_embedder"]["weights"] = (
        params["relation_embedder"]["weights"] * 20.0
    )
    before = np.asarray(
        model.score_spo(params, jnp.asarray(s), jnp.asarray(p), jnp.asarray(o),
                        ctx=Ctx(state=state))
    )
    normalized = model.normalize_params(params)
    phases = np.asarray(normalized["relation_embedder"]["weights"])
    assert (phases >= -np.pi).all() and (phases < np.pi).all()
    after = np.asarray(
        model.score_spo(normalized, jnp.asarray(s), jnp.asarray(p), jnp.asarray(o),
                        ctx=Ctx(state=state))
    )
    np.testing.assert_allclose(before, after, rtol=1e-4, atol=1e-4)


def test_penalties_are_finite():
    model, params, state = _make_model("complex")
    model.config.set("lookup_embedder.regularize_weight", 0.1)
    batch = {"triples": jnp.asarray(model.dataset.split("train").astype(np.int32))}
    terms = model.penalties(params, Ctx(state=state), batch=batch)
    assert len(terms) >= 2
    for name, value in terms:
        assert np.isfinite(float(value)), name


def test_initializer_torch_parity():
    """Config-named initializers must match torch.nn.init semantics
    (reference dispatch: kge/model/kge_model.py:41-80) — moments and
    bounds, since the PRNGs differ."""
    import torch

    from kge_tpu.models.init import initialize

    rng = jax.random.PRNGKey(3)
    shape = (400, 300)

    def stats(name, args, tname=None, targs=None):
        ours = np.asarray(initialize(rng, shape, name, args))
        ref = torch.empty(shape)
        getattr(torch.nn.init, tname or name)(ref, **(targs or args))
        ref = ref.numpy()
        assert abs(ours.mean() - ref.mean()) < 0.02, name
        assert abs(ours.std() - ref.std()) / max(ref.std(), 1e-9) < 0.05, name
        return ours, ref

    stats("kaiming_normal_", {})
    stats("kaiming_normal_", {"mode": "fan_out"})
    # torch honors nonlinearity/a; these change the gain (linear: 1.0,
    # tanh: 5/3, leaky slope: sqrt(2/(1+a^2))) and must carry over
    stats("kaiming_normal_", {"nonlinearity": "linear"})
    stats("kaiming_normal_", {"nonlinearity": "tanh"})
    stats("kaiming_normal_", {"nonlinearity": "leaky_relu", "a": 0.5})
    stats("kaiming_uniform_", {})  # torch default a=0 -> gain sqrt(2)
    stats("kaiming_uniform_", {"a": 2.2360679775})  # Linear-layer style
    stats("kaiming_uniform_", {"mode": "fan_out", "nonlinearity": "relu"})
    stats("trunc_normal_", {"mean": 1.0, "std": 0.5, "a": 0.0, "b": 2.0})
    ours, ref = stats("trunc_normal_", {})
    assert ours.min() >= -2.0 and ours.max() <= 2.0  # torch defaults
    ours, _ = stats("orthogonal_", {"gain": 2.0})
    # rows orthogonal (shape[0] > shape[1]: columns orthonormal * gain)
    gram = ours.T @ ours / 4.0
    np.testing.assert_allclose(gram, np.eye(shape[1]), atol=1e-4)

    # reference quirk: a missing lower bound for uniform_ defaults to -b
    ours = np.asarray(initialize(rng, shape, "uniform_", {"b": 0.25}))
    assert ours.min() < -0.2 and ours.min() >= -0.25
    assert ours.max() <= 0.25
