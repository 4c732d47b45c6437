"""Optimizer and LR-scheduler tests: regex parameter groups, per-group
learning rates, warmup, plateau scheduling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kge_tpu import Config
from kge_tpu.train.optimizer import KgeLRScheduler, KgeOptimizer


def _params():
    return {
        "entity_embedder": {"weights": jnp.ones((4, 2))},
        "relation_embedder": {"weights": jnp.ones((3, 2))},
        "scorer": {},
    }


def test_regex_parameter_groups():
    config = Config()
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("train.optimizer.relation.regex", ".*relation_embedder.*",
               create=True)
    config.set("train.optimizer.relation.args.lr", 0.5, create=True)
    params = _params()
    opt = KgeOptimizer(config, params)
    assert set(opt.base_lrs) == {"relation", "default"}
    assert opt.base_lrs["relation"] == 0.5
    opt_state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    lrs = {g: jnp.asarray(v) for g, v in opt.base_lrs.items()}
    new_params, _ = opt.apply_updates(params, grads, opt_state, lrs)
    # adagrad with accumulator=g^2=1: update = lr * 1/sqrt(1)
    ent_delta = float(
        (params["entity_embedder"]["weights"]
         - new_params["entity_embedder"]["weights"])[0, 0]
    )
    rel_delta = float(
        (params["relation_embedder"]["weights"]
         - new_params["relation_embedder"]["weights"])[0, 0]
    )
    np.testing.assert_allclose(ent_delta, 0.1, rtol=1e-5)
    np.testing.assert_allclose(rel_delta, 0.5, rtol=1e-5)


def test_overlapping_groups_rejected():
    config = Config()
    config.set("train.optimizer.g1.regex", ".*weights.*", create=True)
    config.set("train.optimizer.g1.args.lr", 0.5, create=True)
    config.set("train.optimizer.g2.regex", ".*relation.*", create=True)
    config.set("train.optimizer.g2.args.lr", 0.5, create=True)
    with pytest.raises(ValueError):
        KgeOptimizer(config, _params())


def test_optimizer_types():
    for name in ["Adagrad", "Adam", "AdamW", "SGD", "RMSprop", "Adadelta",
                 "Adamax"]:
        config = Config()
        config.set("train.optimizer.default.type", name)
        config.set("train.optimizer.default.args.lr", 0.01, create=True)
        params = _params()
        opt = KgeOptimizer(config, params)
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        lrs = {g: jnp.asarray(v) for g, v in opt.base_lrs.items()}
        new_params, _ = opt.apply_updates(params, grads, state, lrs)
        delta = np.asarray(
            params["entity_embedder"]["weights"]
            - new_params["entity_embedder"]["weights"]
        )
        assert np.isfinite(delta).all() and (np.abs(delta) > 0).any(), name


def test_warmup_and_exponential():
    config = Config()
    config.set("train.lr_warmup", 4)
    config.set("train.lr_scheduler", "ExponentialLR")
    config.set("train.lr_scheduler_args.gamma", 0.5, create=True)
    sched = KgeLRScheduler(config)
    assert sched.lr_scale(2) == pytest.approx(0.5)   # warmup 2/4
    sched.step()   # epoch 1 done
    assert sched.lr_scale(2) == pytest.approx(0.5 * 0.5)
    assert sched.lr_scale(8) == pytest.approx(0.5)   # warmup over


def test_plateau_scheduler():
    config = Config()
    config.set("train.lr_scheduler", "ReduceLROnPlateau")
    config.set("train.lr_scheduler_args.patience", 1, create=True)
    config.set("train.lr_scheduler_args.factor", 0.1, create=True)
    sched = KgeLRScheduler(config)
    sched.step(0.5)   # best
    sched.step(0.4)   # worse 1
    assert sched.lr_scale(10) == pytest.approx(1.0)
    sched.step(0.4)   # worse 2 -> reduce
    assert sched.lr_scale(10) == pytest.approx(0.1)
    # state round trip
    state = sched.state_dict()
    sched2 = KgeLRScheduler(config)
    sched2.load_state_dict(state)
    assert sched2.lr_scale(10) == pytest.approx(0.1)
