"""Fused shared-negative cross-entropy loss kernel.

The headline negative-sampling train step is kernel-launch-latency
bound (~80 device kernels per step at FB15k-237 scale, ~8% of HBM
roofline): the score matmul, per-row gather of sampled columns, concat
with the positive column, and the log-softmax reduction each lower to
separate XLA kernels, twice per slot, plus their transposed backward
chain. This kernel fuses the whole per-slot loss forward into ONE
Pallas call by reformulating the reference's gather layout
(kge/job/train_negative_sampling.py:177-186: scores [B, 1+num] via
per-row gather from the shared candidate set) into COUNT form:

    loss_row = logsumexp over {pos} u multiset(negatives)
             = log(exp(pos) + sum_n counts[n] * exp(q . cand[n]))
    loss     = sum_rows w_row * (loss_row - pos_row)

``counts[b, n]`` is how many times unique candidate ``n`` was drawn for
row ``b`` (the shared sampler draws with replacement and drops
collisions, so counts encode the exact same multiset the gather
selects). No per-row gather remains — the kernel is a [TB, D] x [D, N]
matmul (MXU) plus row reductions (VPU), tiled over the batch.

The backward is matmul-shaped (softmax-weighted combinations of q and
cand), implemented as plain XLA in the custom VJP — three matmuls and
one elementwise block, which XLA fuses tightly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, cand_ref, pos_ref, counts_ref, w_ref, loss_ref, lse_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[:] = jnp.zeros_like(loss_ref)

    scores = jax.lax.dot_general(
        q_ref[:], cand_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TB, N]
    counts = counts_ref[:]
    pos = pos_ref[:]  # [TB, 1]
    w = w_ref[:]      # [TB, 1]
    # padded candidate rows (counts 0) must not contaminate the max
    s_masked = jnp.where(counts > 0, scores, NEG_INF)
    m = jnp.maximum(jnp.max(s_masked, axis=1, keepdims=True), pos)
    z = jnp.exp(pos - m) + jnp.sum(
        counts * jnp.exp(s_masked - m), axis=1, keepdims=True
    )
    lse = m + jnp.log(z)  # [TB, 1]
    lse_ref[:] = lse
    # (1,1)-shaped accumulate: Mosaic cannot store bare scalars to VMEM
    loss_ref[:] += jnp.sum(w * (lse - pos)).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "tb"))
def _forward(q, cand, pos, counts, w, interpret=False, tb=256):
    B, D = q.shape
    N = cand.shape[0]
    tb = min(tb, _round_up(B, 8))
    Bp, Np = _round_up(B, tb), _round_up(N, 128)
    q_p = jnp.zeros((Bp, D), jnp.float32).at[:B].set(q.astype(jnp.float32))
    cand_p = jnp.zeros((Np, D), jnp.float32).at[:N].set(
        cand.astype(jnp.float32)
    )
    pos_p = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(
        pos.astype(jnp.float32)
    )
    counts_p = jnp.zeros((Bp, Np), jnp.float32).at[:B, :N].set(counts)
    w_p = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(w.astype(jnp.float32))
    loss, lse = pl.pallas_call(
        _kernel,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q_p, cand_p, pos_p, counts_p, w_p)
    return loss[0, 0], lse[:B, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def shared_ce_loss(q, cand, pos, counts, w, interpret=False):
    """sum_b w[b] * (logsumexp({pos[b]} u multiset scores) - pos[b]).

    q [B, D] query vectors, cand [N, D] unique candidate vectors,
    pos [B] positive scores, counts [B, N] multiplicity of each
    candidate in row b's negative sample, w [B] row weights.
    """
    loss, _ = _forward(q, cand, pos, counts, w, interpret=interpret)
    return loss


def _fwd(q, cand, pos, counts, w, interpret):
    loss, lse = _forward(q, cand, pos, counts, w, interpret=interpret)
    return loss, (q, cand, pos, counts, w, lse)


def _bwd(interpret, res, g):
    q, cand, pos, counts, w, lse = res
    qf = q.astype(jnp.float32)
    cf = cand.astype(jnp.float32)
    # recompute scores (cheaper than materializing them as residuals for
    # large batches; one [B, D] x [D, N] matmul)
    scores = qf @ cf.T
    # mask exactly like the forward: an undrawn candidate (counts 0) can
    # score arbitrarily above lse, where exp overflows and 0*inf = NaN
    p = jnp.where(
        counts > 0, counts * jnp.exp(scores - lse[:, None]), 0.0
    )                                                    # [B, N]
    p_pos = jnp.exp(pos.astype(jnp.float32) - lse)       # [B]
    gw = g * w.astype(jnp.float32)
    d_pos = gw * (p_pos - 1.0)
    d_scores = gw[:, None] * p
    d_q = (d_scores @ cf).astype(q.dtype)
    d_cand = (d_scores.T @ qf).astype(cand.dtype)
    return (d_q, d_cand, d_pos.astype(pos.dtype),
            jnp.zeros_like(counts), jnp.zeros_like(w))


shared_ce_loss.defvjp(_fwd, _bwd)


def shared_ce_loss_sharded(q, cand, pos, counts, w, mesh, interpret=False):
    """``shared_ce_loss`` under a device mesh: rows shard over 'data',
    the (small) unique-candidate block replicates, and the per-shard
    partial row sums psum into the full loss. Mirrors the fused eval
    path's shard_map treatment (evaluation/entity_ranking.py) so
    multi-chip training keeps the fused kernel instead of falling back
    to the ~80-kernel XLA chain.

    The batch pads up to a multiple of the 'data' axis; padded rows have
    zero weight and all-zero count rows, which contribute exactly 0 to
    the loss (lse == pos == 0 there)."""
    import jax
    from jax.sharding import PartitionSpec as P

    data = mesh.shape.get("data", 1)
    B = q.shape[0]
    Bp = -(-B // data) * data
    if Bp != B:
        q = jnp.zeros((Bp, q.shape[1]), q.dtype).at[:B].set(q)
        pos = jnp.zeros((Bp,), pos.dtype).at[:B].set(pos)
        counts = jnp.zeros(
            (Bp, counts.shape[1]), counts.dtype
        ).at[:B].set(counts)
        w = jnp.zeros((Bp,), w.dtype).at[:B].set(w)

    def local(qs, cand_full, ps, cs, ws):
        part = shared_ce_loss(qs, cand_full, ps, cs, ws, interpret)
        return jax.lax.psum(part, "data")

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P(None, None), P("data"),
                  P("data", None), P("data")),
        out_specs=P(),
        # pallas_call's out_shape carries no varying-mesh-axes
        # annotation, so the vma check cannot see through it (same
        # waiver as the fused sharded eval path)
        check_vma=False,
    )(q, cand, pos, counts, w)


def shared_ce_loss_xla(q, cand, pos, counts, w):
    """Pure-XLA count-form reference (and CPU fallback)."""
    scores = q.astype(jnp.float32) @ cand.astype(jnp.float32).T
    s_masked = jnp.where(counts > 0, scores, NEG_INF)
    posf = pos.astype(jnp.float32)
    m = jnp.maximum(jnp.max(s_masked, axis=1), posf)
    z = jnp.exp(posf - m) + jnp.sum(
        counts * jnp.exp(s_masked - m[:, None]), axis=1
    )
    lse = m + jnp.log(z)
    return jnp.sum(w.astype(jnp.float32) * (lse - posf))
