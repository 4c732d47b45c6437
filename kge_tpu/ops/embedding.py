"""Embedding lookup tuned for TPU.

Row gathers from an embedding table are latency-bound on TPU (one small
DMA per row), and the VJP of ``jnp.take`` is a serializing scatter-add.
For moderate vocabularies it is much faster to express the lookup as a
one-hot matmul on the MXU in BOTH directions:

  forward:  out    = one_hot(idx) @ table          ([B,V] @ [V,D])
  backward: dtable = one_hot(idx)^T @ g            ([V,B] @ [B,D])

With matmul precision "highest" the 0/1 operand makes this exact (each
output row is a single product against 1.0). ``mode="auto"`` picks the
one-hot path when ``rows * vocab`` stays within a flops/memory budget
and falls back to gather (+dense one-hot backward in chunks) otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_CHUNK = 4096
# one-hot budget: rows*vocab elements materialized per chunk
_ONEHOT_VOCAB_LIMIT = 1 << 17      # beyond this, one-hot matmuls waste flops
_ONEHOT_ROWS_LIMIT = 1 << 14


def _onehot_matmul(table, indexes):
    onehot = jax.nn.one_hot(indexes, table.shape[0], dtype=table.dtype)
    return jax.lax.dot(
        onehot, table, precision=jax.lax.Precision.HIGHEST
    )


@jax.custom_vjp
def _lookup_onehot(table, indexes):
    return _onehot_matmul(table, indexes)


def _oh_fwd(table, indexes):
    return _onehot_matmul(table, indexes), (indexes, table.shape[0])


def _dense_grad(indexes, g, vocab):
    flat_idx = indexes.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    n = flat_idx.shape[0]
    if n <= _CHUNK:
        onehot = jax.nn.one_hot(flat_idx, vocab, dtype=flat_g.dtype)
        return jax.lax.dot(
            onehot.T, flat_g, precision=jax.lax.Precision.HIGHEST
        )
    pad = (-n) % _CHUNK
    idx_p = jnp.concatenate(
        [flat_idx, jnp.full((pad,), vocab, flat_idx.dtype)]
    ).reshape(-1, _CHUNK)
    g_p = jnp.concatenate(
        [flat_g, jnp.zeros((pad, flat_g.shape[1]), flat_g.dtype)]
    ).reshape(-1, _CHUNK, flat_g.shape[1])

    def body(acc, chunk):
        idx_c, g_c = chunk
        onehot = jax.nn.one_hot(idx_c, vocab, dtype=g_c.dtype)
        return acc + jax.lax.dot(
            onehot.T, g_c, precision=jax.lax.Precision.HIGHEST
        ), None

    dtable, _ = jax.lax.scan(
        body, jnp.zeros((vocab, flat_g.shape[1]), flat_g.dtype),
        (idx_p, g_p),
    )
    return dtable


def _oh_bwd(residuals, g):
    indexes, vocab = residuals
    return _dense_grad(indexes, g, vocab), None


_lookup_onehot.defvjp(_oh_fwd, _oh_bwd)


@jax.custom_vjp
def _lookup_gather_densegrad(table, indexes):
    return jnp.take(table, indexes, axis=0)


def _g_fwd(table, indexes):
    return jnp.take(table, indexes, axis=0), (indexes, table.shape[0])


def _g_bwd(residuals, g):
    indexes, vocab = residuals
    return _dense_grad(indexes, g, vocab), None


_lookup_gather_densegrad.defvjp(_g_fwd, _g_bwd)


def embedding_lookup(table: jnp.ndarray, indexes: jnp.ndarray,
                     mode: str = "auto") -> jnp.ndarray:
    """Lookup rows of ``table`` at ``indexes`` ([..., D] output)."""
    vocab = table.shape[0]
    rows = 1
    for s in indexes.shape:
        rows *= s
    if mode == "auto":
        if vocab <= _ONEHOT_VOCAB_LIMIT and rows <= _ONEHOT_ROWS_LIMIT:
            mode = "onehot"
        elif vocab <= _ONEHOT_VOCAB_LIMIT:
            mode = "gather_densegrad"
        else:
            mode = "gather"
    if mode == "onehot":
        out = _lookup_onehot(table, indexes.reshape(-1))
    elif mode == "gather_densegrad":
        out = _lookup_gather_densegrad(table, indexes.reshape(-1))
    elif mode == "gather":
        out = jnp.take(table, indexes.reshape(-1), axis=0)
    else:
        raise ValueError(
            f"unknown tpu.embedding_lookup mode {mode!r} "
            "(auto/onehot/gather_densegrad/gather)"
        )
    return out.reshape(*indexes.shape, table.shape[1])
