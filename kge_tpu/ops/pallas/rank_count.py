"""Fused score + rank-count Pallas kernel for entity-ranking evaluation.

Entity ranking needs, per query row, only two numbers against each
candidate chunk: how many candidate scores are strictly greater than the
true score (beyond tie tolerance) and how many tie with it (reference
semantics: kge/job/eval_entity_ranking.py:571-596). The scores
themselves are never needed — so this kernel fuses the [B, D] x [D, C]
score matmul (MXU) with the compare-and-accumulate (VPU) per candidate
tile, keeping the [B, C] score matrix entirely in VMEM tiles instead of
round-tripping it through HBM.

Works for every scorer with a dot form (ComplEx, DistMult, CP, SimplE,
RESCAL, Transformer/ConvE feature dots): scores = q @ cand^T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _greater_close(scores, t, atol: float, rtol: float):
    """(greater, close) masks — THE tie semantics, shared by the Pallas
    kernel, the XLA referee, and greater_tie_counts. NaN scores compare
    as -inf. The tolerance term applies to FINITE pairs only; non-finite
    values are close iff equal (torch.isclose semantics — the bare
    formula would make every finite score 'tie' with a -inf true score,
    ranking a NaN-scoring row first instead of last)."""
    scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    finite = jnp.isfinite(scores) & jnp.isfinite(t)
    is_close = (scores == t) | (
        finite & (jnp.abs(scores - t) <= atol + rtol * jnp.abs(t))
    )
    return (scores > t) & jnp.logical_not(is_close), is_close


def _kernel(q_ref, cand_ref, true_ref, cvalid_ref, rank_ref, ties_ref,
            *, atol: float, rtol: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        ties_ref[:] = jnp.zeros_like(ties_ref)

    scores = jax.lax.dot_general(
        q_ref[:], cand_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # pinned: Mosaic lowers only HIGHEST/DEFAULT, and the kernel's
        # contract is exact-f32 scoring for tie semantics regardless of
        # the ambient (tpu.eval_matmul_precision) context
        precision=jax.lax.Precision.HIGHEST,
    )  # [TB, TC]
    true = true_ref[:]          # [TB, 1]
    valid = cvalid_ref[:]       # [1, TC]
    is_greater, is_close = _greater_close(scores, true, atol, rtol)
    mask = valid > 0
    rank_ref[:] += jnp.sum(
        jnp.where(is_greater & mask, 1, 0), axis=1, keepdims=True
    ).astype(jnp.int32)
    ties_ref[:] += jnp.sum(
        jnp.where(is_close & mask, 1, 0), axis=1, keepdims=True
    ).astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("atol", "rtol", "interpret", "tb", "tc")
)
def rank_counts(q: jnp.ndarray, cand: jnp.ndarray, true: jnp.ndarray,
                cand_valid: jnp.ndarray, atol: float = 1e-5,
                rtol: float = 1e-4, interpret: bool = False,
                tb: int = 256, tc: int = 0):
    """(rank [B], ties [B]) of ``true`` within ``q @ cand^T`` scores.

    ``cand_valid`` masks padded candidate rows. NaN scores and NaN true
    scores compare as -inf per the reference's NaN handling (the caller
    replaces NaN true scores beforehand).
    """
    B, D = q.shape
    C = cand.shape[0]
    if tc <= 0:
        # candidate tile bounded to ~4 MiB: big tiles amortize the
        # per-tile grid overhead (measured 2.6x at Wikidata5M scale,
        # tc 2048 -> 8192 at D=128) while 2x that trips the 16 MiB
        # scoped-VMEM limit with double buffering. Must be a multiple
        # of 128: tc is the LAST dim of the cand_valid block.
        tc = (4 << 20) // (D * 4) // 128 * 128
        # no floor above the budget: flooring at 2048 would put a
        # D=2048 candidate block at 16 MiB and trip scoped VMEM
        tc = max(128, min(8192, tc))
    Bp, Cp = _round_up(B, tb), _round_up(C, tc)
    q_p = jnp.zeros((Bp, D), q.dtype).at[:B].set(q)
    # cand is NOT padded: for identity candidate transforms it is the
    # raw (multi-GiB at Wikidata5M scale) embedding table, and an
    # explicit pad would copy it wholesale. Pallas handles the ragged
    # trailing block; whatever the boundary tile reads is excluded by
    # the (cheaply padded) cand_valid mask.
    true_p = jnp.full((Bp, 1), jnp.inf, jnp.float32).at[:B, 0].set(true)
    cvalid_p = jnp.zeros((1, Cp), jnp.float32).at[0, :C].set(
        cand_valid.astype(jnp.float32)
    )
    grid = (Bp // tb, Cp // tc)
    rank, ties = pl.pallas_call(
        functools.partial(_kernel, atol=atol, rtol=rtol),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_p, cand, true_p, cvalid_p)
    return rank[:B, 0], ties[:B, 0]


def rank_counts_xla(q, cand, true, cand_valid, atol=1e-5, rtol=1e-4):
    """Reference XLA implementation (and CPU fallback)."""
    scores = q @ cand.T
    is_greater, is_close = _greater_close(scores, true[:, None], atol, rtol)
    mask = cand_valid[None, :] > 0
    rank = jnp.sum(is_greater & mask, axis=1, dtype=jnp.int32)
    ties = jnp.sum(is_close & mask, axis=1, dtype=jnp.int32)
    return rank, ties


def greater_tie_counts(scores, true, valid, axis, atol=1e-5, rtol=1e-4):
    """Canonical greater/tie counting over precomputed scores: NaN scores
    rank last, ``valid`` masks padding, tie tolerance matches the
    reference's semantics. Single source of truth for every counting
    path (generic chunks, fused coordinate subtraction, pair ranking).
    """
    t = jnp.where(jnp.isnan(true), -jnp.inf, true)
    is_greater, is_close = _greater_close(scores, t, atol, rtol)
    rank = jnp.sum(is_greater & valid, axis=axis, dtype=jnp.int32)
    ties = jnp.sum(is_close & valid, axis=axis, dtype=jnp.int32)
    return rank, ties
