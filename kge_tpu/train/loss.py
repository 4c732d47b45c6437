"""Loss functions as pure jnp functions.

Contract (identical to the reference, kge/util/loss.py:19-23): a loss
returns the SUM over batch elements; the training job divides by batch
size. ``labels`` is either an index vector [B] (position of the single
1-label per row) or a {0,1} matrix [B, N].

Padded batches: ``row_weights`` (0/1 per row) masks out padding rows so
that every batch can be compiled with one static shape — the TPU-native
replacement for the reference's variable-size final batches.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from kge_tpu.config import Config


def _labels_as_matrix(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    if labels.ndim == 2:
        return labels.astype(scores.dtype)
    return jax.nn.one_hot(labels, scores.shape[1], dtype=scores.dtype)


def _labels_as_indexes(labels: jnp.ndarray) -> jnp.ndarray:
    if labels.ndim == 1:
        return labels
    return jnp.argmax(labels, axis=1)


def _row_weights(scores, row_weights):
    if row_weights is None:
        return jnp.ones(scores.shape[0], dtype=scores.dtype)
    return row_weights.astype(scores.dtype)


def _bce_with_logits(scores, labels):
    # elementwise log(1 + exp(-|x|)) + max(x,0) - x*y  (stable BCE)
    return jnp.maximum(scores, 0.0) - scores * labels + jnp.log1p(
        jnp.exp(-jnp.abs(scores))
    )


class KgeLoss:
    """Factory + base for losses (reference: kge/util/loss.py:18-91)."""

    def __init__(self, config: Config):
        self.config = config

    @staticmethod
    def create(config: Config) -> "KgeLoss":
        return _Float32Loss(KgeLoss._create(config))

    @staticmethod
    def _create(config: Config) -> "KgeLoss":
        config.check(
            "train.loss",
            ["bce", "bce_mean", "bce_self_adversarial", "margin_ranking",
             "ce", "kl", "soft_margin", "se"],
        )
        name = config.get("train.loss")
        if name in ("bce", "bce_mean", "bce_self_adversarial"):
            offset = config.get("train.loss_arg")
            if math.isnan(offset):
                offset = 0.0
                config.set("train.loss_arg", offset, log=True)
            if name == "bce":
                return BCEWithLogitsKgeLoss(config, offset=offset)
            if name == "bce_mean":
                return BCEWithLogitsKgeLoss(config, offset=offset, bce_type="mean")
            try:
                temperature = float(
                    config.get("user.bce_self_adversarial_temperature")
                )
            except KeyError:
                temperature = 1.0
            config.log(f"Using adversarial temperature {temperature}")
            return BCEWithLogitsKgeLoss(
                config, offset=offset, bce_type="self_adversarial",
                temperature=temperature,
            )
        if name in ("kl", "ce"):
            return KLDivWithSoftmaxKgeLoss(config)
        if name == "margin_ranking":
            margin = config.get("train.loss_arg")
            if math.isnan(margin):
                margin = 1.0
                config.set("train.loss_arg", margin, log=True)
            return MarginRankingKgeLoss(config, margin=margin)
        if name == "soft_margin":
            return SoftMarginKgeLoss(config)
        if name == "se":
            return SEKgeLoss(config)
        raise ValueError(f"invalid train.loss={name}")

    def __call__(self, scores, labels, row_weights=None, **kwargs) -> jnp.ndarray:
        raise NotImplementedError


class _Float32Loss(KgeLoss):
    """Casts scores to f32 before the loss math: with
    ``tpu.compute_dtype: bfloat16`` the scorer runs in bf16, but
    log/exp/softmax reductions stay f32 for stability."""

    def __init__(self, inner: KgeLoss):
        super().__init__(inner.config)
        self._inner = inner

    def __getattr__(self, name):
        if name == "_inner":
            raise AttributeError(name)
        return getattr(self._inner, name)

    def __call__(self, scores, labels, row_weights=None, **kwargs):
        return self._inner(
            jnp.asarray(scores, jnp.float32), labels,
            row_weights=row_weights, **kwargs,
        )


class BCEWithLogitsKgeLoss(KgeLoss):
    def __init__(self, config, offset=0.0, bce_type=None, temperature=1.0):
        super().__init__(config)
        self._offset = offset
        self._bce_type = bce_type
        self._temperature = temperature

    def __call__(self, scores, labels, row_weights=None, **kwargs):
        labels_m = _labels_as_matrix(scores, labels)
        w = _row_weights(scores, row_weights)
        if self._offset != 0.0:
            scores = scores + self._offset
        losses = _bce_with_logits(scores, labels_m)
        if self._bce_type is None:
            return jnp.sum(losses * w[:, None])
        # positives in the column indicated by labels; the rest negative
        idx = _labels_as_indexes(labels)
        pos = jnp.take_along_axis(losses, idx[:, None], axis=1)[:, 0]
        if self._bce_type == "mean":
            neg = jnp.sum(losses, axis=1) - pos
            per_row = (pos + neg / (scores.shape[1] - 1)) / 2.0
            return jnp.sum(per_row * w)
        if self._bce_type == "self_adversarial":
            neg_mask = 1.0 - _labels_as_matrix(scores, idx)
            # softmax over negative scores only (positives masked to -inf)
            neg_scores = jnp.where(
                neg_mask > 0, jax.lax.stop_gradient(scores), -jnp.inf
            )
            weights = jax.nn.softmax(neg_scores * self._temperature, axis=1)
            neg = jnp.sum(weights * losses * neg_mask, axis=1)
            return jnp.sum((pos + neg) / 2.0 * w)
        raise NotImplementedError(self._bce_type)


class KLDivWithSoftmaxKgeLoss(KgeLoss):
    """Cross entropy for index labels; KL divergence against the
    L1-normalized label distribution for matrix labels."""

    def __call__(self, scores, labels, row_weights=None, **kwargs):
        w = _row_weights(scores, row_weights)
        log_probs = jax.nn.log_softmax(scores, axis=1)
        if labels.ndim == 1:
            picked = jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
            return jnp.sum(-picked * w)
        labels = labels.astype(scores.dtype)
        denom = jnp.maximum(jnp.sum(labels, axis=1, keepdims=True), 1e-30)
        target = labels / denom
        log_target = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-30)), 0.0)
        kl = jnp.sum(target * (log_target - log_probs), axis=1)
        return jnp.sum(kl * w)


class SoftMarginKgeLoss(KgeLoss):
    def __call__(self, scores, labels, row_weights=None, **kwargs):
        labels_m = _labels_as_matrix(scores, labels) * 2.0 - 1.0
        w = _row_weights(scores, row_weights)
        losses = jnp.log1p(jnp.exp(-labels_m * scores))
        return jnp.sum(losses * w[:, None])


class MarginRankingKgeLoss(KgeLoss):
    """Pairs each positive (column 0) with its row's negatives.

    Only defined for negative-sampling scores [B, 1+num_negatives]
    (reference: kge/util/loss.py:228-262)."""

    def __init__(self, config, margin):
        super().__init__(config)
        self._margin = margin
        self._train_type = config.get("train.type")

    def __call__(self, scores, labels, row_weights=None, num_negatives=None,
                 **kwargs):
        if "negative_sampling" not in self._train_type:
            raise NotImplementedError(
                "margin ranking is only supported with negative sampling"
            )
        w = _row_weights(scores, row_weights)
        idx = _labels_as_indexes(labels)
        pos = jnp.take_along_axis(scores, idx[:, None], axis=1)  # [B, 1]
        neg_mask = 1.0 - _labels_as_matrix(scores, idx)
        losses = jnp.maximum(0.0, self._margin - (pos - scores)) * neg_mask
        return jnp.sum(losses * w[:, None])


class SEKgeLoss(KgeLoss):
    def __call__(self, scores, labels, row_weights=None, **kwargs):
        labels_m = _labels_as_matrix(scores, labels)
        w = _row_weights(scores, row_weights)
        return jnp.sum((scores - labels_m) ** 2 * w[:, None])
