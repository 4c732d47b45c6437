"""Segment/scatter primitives and GNN math helpers.

The reference's vendored torch_scatter kernels and sparse-sum autograd
function (reference: kge/model/embedder/rgnn_utils.py) all reduce to
``jax.ops.segment_sum`` — XLA differentiates segment ops natively, so no
custom autograd is needed. Circular correlation uses jnp.fft.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int, indices_are_sorted: bool = False
                ) -> jnp.ndarray:
    """indices_are_sorted lets XLA lower the scatter-add without the
    general scatter's conflict handling — the graph builder sorts each
    edge half by its aggregation node so the hot GNN reductions qualify."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def degree_norm(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray,
                num_nodes: int, src_sorted: bool = False) -> jnp.ndarray:
    """Symmetric degree edge norm 1/(sqrt(D_src) sqrt(D_dst)), with edge
    dropout masks folded into the degrees (reference: rgnn_encoder.py
    edge_norm)."""
    deg = segment_sum(mask, src, num_nodes, indices_are_sorted=src_sorted)
    deg_inv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
    return deg_inv[src] * deg_inv[dst] * mask


def ccorr(h_j: jnp.ndarray, h_r: jnp.ndarray) -> jnp.ndarray:
    """Circular correlation conj(F(h_j)) * F(h_r) -> iF (reference:
    rgnn_utils.py ccorr).

    QUIRK REPLICATED: the reference's torch-2.x port of the deprecated
    torch.irfft slices the rfft spectrum to ``len // 2 + 1`` bins AGAIN
    before inverting (rgnn_utils.py:219-221), silently zeroing the
    upper half of the frequency spectrum — so its "ccorr" is not true
    circular correlation. Trained reference models embed this behavior,
    and tests/test_reference_parity.py (compgcn-ccorr) pins it, so we
    reproduce the truncation exactly."""
    n = h_j.shape[-1]
    fj = jnp.fft.rfft(h_j, axis=-1)
    fr = jnp.fft.rfft(h_r, axis=-1)
    spec = jnp.conj(fj) * fr
    keep = spec.shape[-1] // 2 + 1
    pad = spec.shape[-1] - keep
    spec = jnp.pad(spec[..., :keep], [(0, 0)] * (spec.ndim - 1) + [(0, pad)])
    return jnp.fft.irfft(spec, n=n, axis=-1)


def ccorr_true(h_j: jnp.ndarray, h_r: jnp.ndarray) -> jnp.ndarray:
    """Textbook circular correlation (full spectrum). Configure
    ``composition: ccorr_true`` for checkpoints trained with kge_tpu
    builds that predate the reference-quirk replication in ``ccorr``,
    or when the exact operation is wanted."""
    n = h_j.shape[-1]
    fj = jnp.fft.rfft(h_j, axis=-1)
    fr = jnp.fft.rfft(h_r, axis=-1)
    return jnp.fft.irfft(jnp.conj(fj) * fr, n=n, axis=-1)


# ---- compositions (reference: rgnn_utils.py:168-224) --------------------

def composition_fn(name: str):
    if name in ("neighbor", "neighbour"):
        return lambda h_i, h_j, h_r, w=None: h_j if w is None else h_j * w
    if name == "sub":
        return lambda h_i, h_j, h_r, w=None: h_j - h_r
    if name == "sub_weighted":
        return lambda h_i, h_j, h_r, w: h_j * w - h_r
    if name == "mult":
        return lambda h_i, h_j, h_r, w=None: h_j * h_r
    if name == "mult_weighted":
        return lambda h_i, h_j, h_r, w: h_j * h_r * w
    if name == "cross":
        return lambda h_i, h_j, h_r, w=None: h_j * h_r + h_j
    if name == "cross_weighted":
        return lambda h_i, h_j, h_r, w: h_j * h_r * w + h_j * w
    if name == "ccorr":
        return lambda h_i, h_j, h_r, w=None: ccorr(h_j, h_r)
    if name == "ccorr_weighted":
        return lambda h_i, h_j, h_r, w: ccorr(h_j * w, h_r)
    if name == "ccorr_true":
        return lambda h_i, h_j, h_r, w=None: ccorr_true(h_j, h_r)
    if name == "ccorr_true_weighted":
        return lambda h_i, h_j, h_r, w: ccorr_true(h_j * w, h_r)
    raise NotImplementedError(f"composition function {name} not found")


# ---- initializers (reference: rgnn_utils.py:130-164) ---------------------

def schlichtkrull_std(shape, gain=1.0, fans=None):
    if fans is not None:
        fan_in, fan_out = fans
    else:
        fan_in, fan_out = shape[-2], shape[-1]
    return gain * 3.0 / math.sqrt(float(fan_in + fan_out))


def schlichtkrull_normal_(rng, shape, fans=None):
    return schlichtkrull_std(shape, fans=fans) * jax.random.normal(
        rng, shape, dtype=jnp.float32
    )


def schlichtkrull_uniform_(rng, shape, fans=None):
    std = schlichtkrull_std(shape, fans=fans)
    return jax.random.uniform(rng, shape, minval=-std, maxval=std,
                              dtype=jnp.float32)


def wgcn_uniform_(rng, shape):
    if len(shape) == 1:
        std = 1.0 / math.sqrt(shape[0])
    else:
        std = 1.0 / math.sqrt(shape[1])
    return jax.random.uniform(rng, shape, minval=-std, maxval=std,
                              dtype=jnp.float32)
