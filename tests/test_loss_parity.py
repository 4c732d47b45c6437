"""Loss parity against torch reference formulas.

The reference's loss semantics ARE torch's (BCEWithLogitsLoss,
CrossEntropyLoss, KLDivLoss, MarginRankingLoss, SoftMarginLoss, MSELoss
with reduction='sum'); torch (CPU) is available here, so these tests pin
our jnp implementations to the exact same numbers.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from kge_tpu import Config
from kge_tpu.train.loss import KgeLoss


def _make_loss(name, train_type="negative_sampling", loss_arg=float("nan")):
    config = Config()
    config.set("train.loss", name)
    config.set("train.type", train_type)
    config.set("train.loss_arg", loss_arg)
    return KgeLoss.create(config)


@pytest.fixture()
def data():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(7, 5)).astype(np.float32)
    labels_idx = rng.integers(5, size=7).astype(np.int32)
    labels_mat = np.zeros((7, 5), dtype=np.float32)
    labels_mat[np.arange(7), labels_idx] = 1.0
    return scores, labels_idx, labels_mat


def test_bce(data):
    scores, _, labels_mat = data
    ours = float(_make_loss("bce")(jnp.asarray(scores), jnp.asarray(labels_mat)))
    theirs = float(F.binary_cross_entropy_with_logits(
        torch.tensor(scores).view(-1), torch.tensor(labels_mat).view(-1),
        reduction="sum",
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_kl_index_labels(data):
    scores, labels_idx, _ = data
    ours = float(_make_loss("kl")(jnp.asarray(scores), jnp.asarray(labels_idx)))
    theirs = float(F.cross_entropy(
        torch.tensor(scores), torch.tensor(labels_idx).long(),
        reduction="sum",
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_kl_matrix_labels(data):
    scores, _, labels_mat = data
    # multi-label row
    labels_mat = labels_mat.copy()
    labels_mat[0, :3] = 1.0
    ours = float(_make_loss("kl")(jnp.asarray(scores), jnp.asarray(labels_mat)))
    target = torch.nn.functional.normalize(
        torch.tensor(labels_mat), p=1, dim=1
    )
    theirs = float(F.kl_div(
        F.log_softmax(torch.tensor(scores), dim=1), target, reduction="sum"
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_margin_ranking(data):
    scores, _, _ = data
    # negative-sampling layout: column 0 positive, rest negatives
    labels = np.zeros(7, dtype=np.int32)
    ours = float(_make_loss("margin_ranking", loss_arg=2.0)(
        jnp.asarray(scores), jnp.asarray(labels), num_negatives=4
    ))
    pos = torch.tensor(scores[:, :1]).repeat(1, 4).reshape(-1)
    neg = torch.tensor(scores[:, 1:]).reshape(-1)
    theirs = float(F.margin_ranking_loss(
        pos, neg, torch.ones_like(pos), margin=2.0, reduction="sum"
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_soft_margin(data):
    scores, _, labels_mat = data
    ours = float(_make_loss("soft_margin")(
        jnp.asarray(scores), jnp.asarray(labels_mat)
    ))
    theirs = float(F.soft_margin_loss(
        torch.tensor(scores).view(-1),
        torch.tensor(labels_mat * 2 - 1).view(-1), reduction="sum",
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_se(data):
    scores, _, labels_mat = data
    ours = float(_make_loss("se")(jnp.asarray(scores), jnp.asarray(labels_mat)))
    theirs = float(F.mse_loss(
        torch.tensor(scores), torch.tensor(labels_mat), reduction="sum"
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_bce_mean(data):
    scores, labels_idx, labels_mat = data
    ours = float(_make_loss("bce_mean")(
        jnp.asarray(scores), jnp.asarray(labels_idx)
    ))
    # reference formula: (sum positives + sum(negatives)/(N-1)) / 2
    losses = F.binary_cross_entropy_with_logits(
        torch.tensor(scores), torch.tensor(labels_mat), reduction="none"
    )
    pos = losses[torch.arange(7), torch.tensor(labels_idx).long()]
    neg = losses.sum(dim=1) - pos
    theirs = float((pos.sum() + neg.sum() / 4) / 2.0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_bce_self_adversarial(data):
    scores, labels_idx, labels_mat = data
    ours = float(_make_loss("bce_self_adversarial")(
        jnp.asarray(scores), jnp.asarray(labels_idx)
    ))
    losses = F.binary_cross_entropy_with_logits(
        torch.tensor(scores), torch.tensor(labels_mat), reduction="none"
    )
    pos = losses[torch.arange(7), torch.tensor(labels_idx).long()]
    neg_mask = torch.tensor(labels_mat) == 0
    neg_scores = torch.tensor(scores)[neg_mask].view(7, 4)
    neg_losses = losses[neg_mask].view(7, 4)
    weights = F.softmax(neg_scores, dim=1)
    theirs = float((pos.sum() + (weights * neg_losses).sum(dim=1).sum()) / 2.0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
