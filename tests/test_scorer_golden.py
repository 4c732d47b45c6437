"""Golden scorer tests: every scorer is checked against an independent
numpy implementation of its published scoring function, using the
reference's parameter-layout conventions (reference: kge/model/*.py),
on the actual embedding tables the model initializes.

This complements the score-form consistency tests: those verify
spo/sp_/_po agree with each other; these verify the math itself (signs,
half-splits, complex layouts, norms) matches the reference semantics.
"""

import numpy as np
import jax
import pytest

from kge_tpu import Dataset
from kge_tpu.models import Ctx, KgeModel

from tests.util import create_config, get_dataset_folder


def _np_complex(s, p, o):
    h = s.shape[1] // 2
    s_re, s_im = s[:, :h], s[:, h:]
    p_re, p_im = p[:, :h], p[:, h:]
    o_re, o_im = o[:, :h], o[:, h:]
    return (
        (s_re * p_re * o_re).sum(1)
        + (s_im * p_re * o_im).sum(1)
        + (s_re * p_im * o_im).sum(1)
        - (s_im * p_im * o_re).sum(1)
    )


def _np_distmult(s, p, o):
    return (s * p * o).sum(1)


def _np_cp(s, p, o):
    h = s.shape[1] // 2
    return (s[:, :h] * p * o[:, h:]).sum(1)


def _np_simple(s, p, o):
    h = s.shape[1] // 2
    s_h, s_t = s[:, :h], s[:, h:]
    p_f, p_b = p[:, :h], p[:, h:]
    o_h, o_t = o[:, :h], o[:, h:]
    return ((s_h * p_f * o_t).sum(1) + (s_t * p_b * o_h).sum(1)) / 2.0


def _np_transe(s, p, o, norm=2.0):
    return -np.power(
        np.power(np.abs(s + p - o), norm).sum(1), 1.0 / norm
    )


def _np_rescal(s, p, o):
    d = s.shape[1]
    m = p.reshape(-1, d, d)
    return np.einsum("bi,bij,bj->b", s, m, o)


def _np_rotate(s, p, o, norm=1.0):
    h = s.shape[1] // 2
    s_re, s_im = s[:, :h], s[:, h:]
    o_re, o_im = o[:, :h], o[:, h:]
    p_re, p_im = np.cos(p), np.sin(p)
    sp_re = s_re * p_re - s_im * p_im
    sp_im = s_re * p_im + s_im * p_re
    diff = np.sqrt((sp_re - o_re) ** 2 + (sp_im - o_im) ** 2)
    return -np.power(np.power(diff, norm).sum(1), 1.0 / norm)


def _np_transh(s, p, o, norm=2.0):
    h = p.shape[1] // 2
    rel, nvec = p[:, :h], p[:, h:]
    nvec = nvec / np.linalg.norm(nvec, axis=1, keepdims=True)

    def transfer(e):
        return e - (e * nvec).sum(1, keepdims=True) * nvec

    diff = transfer(s) + rel - transfer(o)
    return -np.power(np.power(np.abs(diff), norm).sum(1), 1.0 / norm)


GOLDEN = {
    "complex": _np_complex,
    "distmult": _np_distmult,
    "cp": _np_cp,
    "simple": _np_simple,
    "transe": _np_transe,
    "rescal": _np_rescal,
    "rotate": _np_rotate,
    "transh": _np_transh,
}


@pytest.mark.parametrize("model_name", sorted(GOLDEN))
def test_scorer_matches_independent_formula(model_name):
    config = create_config("dataset_test", model=model_name)
    config.set("lookup_embedder.dim", 8)
    dataset = Dataset.create(config, get_dataset_folder("dataset_test"))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(42))

    rng = np.random.default_rng(0)
    n = 12
    s = rng.integers(dataset.num_entities(), size=n).astype(np.int32)
    p = rng.integers(dataset.num_relations(), size=n).astype(np.int32)
    o = rng.integers(dataset.num_entities(), size=n).astype(np.int32)

    ours = np.asarray(
        model.score_spo(params, s, p, o, direction="o", ctx=Ctx())
    ).reshape(-1)

    ent = np.asarray(params["entity_embedder"]["weights"])
    rel = np.asarray(params["relation_embedder"]["weights"])
    kwargs = {}
    if model_name in ("transe", "transh", "rotate"):
        # golden formula follows the configured norm (default l_norm 1.0,
        # matching the reference's model yamls)
        kwargs["norm"] = float(config.get(f"{model_name}.l_norm"))
    golden = GOLDEN[model_name](ent[s], rel[p], ent[o], **kwargs)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)
