"""Platform probe: row-sparse Adagrad updates at Wikidata5M scale with
the entity table stored as K row-chunks, each under
tpu.sparse_scatter_limit_bytes.

Round-4 characterized the v5e fault as "in-place writes to multi-GiB
buffers inside large programs"; round 5 found even the COPYING fused
scatter form crashing at 2.46 GiB in a fresh process. This probe asks
the question the chunked design stands on: do scatters into sub-1-GiB
chunk buffers run reliably (per-dispatch and scanned), and do they run
in place (step time ~ touched rows, not table passes)?

Usage: python probe_chunked_sparse.py VARIANT [K]
  VARIANT in {mono_dispatch, chunk_dispatch, chunk_scan, gather_only}
Each variant prints one JSON line; run variants in separate processes
(a worker crash kills the process).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V = 4_818_688          # padded w5m entity vocab (divisible by 8 and 2^7)
D = 128
U = 2304               # touched rows per step (2*1024 batch + shared negs)
LR = 0.1
EPS = 1e-10
STEPS = 16


def make_uniq(rng, v):
    ids = np.sort(rng.choice(v, size=U, replace=False)).astype(np.int32)
    return jnp.asarray(ids)


def loss_grads(rows, key):
    """Matmul-shaped stand-in for the fused negsamp loss over gathered
    rows: queries x candidates + logsumexp, so the grads have realistic
    structure and magnitude."""
    q = rows[:1024]
    cand = rows[1024:1024 + 129]

    def f(r):
        qq = r[:1024]
        cc = r[1024:1024 + 129]
        scores = qq @ cc.T
        return (jnp.mean(jax.nn.logsumexp(scores, axis=1))
                - jnp.mean(jnp.sum(qq * cc[:1024 % 129][:1, :], axis=1)))

    return jax.grad(f)(rows)


def chunk_update(chunk, acc, uniq, grads, k, vc):
    # negative locals clamp to 0 with masked values (mode="drop" drops
    # only >= size; negatives would wrap); past-the-end stays and drops.
    # The clamped prefix keeps the index vector sorted.
    local = uniq - k * vc
    idx = jnp.maximum(local, 0)
    mask = (local >= 0).astype(grads.dtype)[:, None]
    g = grads * mask
    sum_rows = jnp.take(acc, jnp.clip(local, 0, vc - 1), axis=0)
    new_sum_rows = sum_rows + g * g
    upd = g / (jnp.sqrt(new_sum_rows) + EPS)
    acc = acc.at[idx].add(g * g, indices_are_sorted=True, mode="drop")
    chunk = chunk.at[idx].add(-LR * upd, indices_are_sorted=True,
                              mode="drop")
    return chunk, acc


def gather_chunks(chunks, uniq, vc):
    rows = jnp.zeros((U, D), jnp.float32)
    for k, c in enumerate(chunks):
        local = uniq - k * vc
        inb = (local >= 0) & (local < vc)
        rows = rows + jnp.take(
            c, jnp.clip(local, 0, vc - 1), axis=0
        ) * inb[:, None]
    return rows


def step_chunked(chunks, accs, uniq, key, vc):
    rows = gather_chunks(chunks, uniq, vc)
    grads = loss_grads(rows, key)
    new_chunks, new_accs = [], []
    for k, (c, a) in enumerate(zip(chunks, accs)):
        c2, a2 = chunk_update(c, a, uniq, grads, k, vc)
        new_chunks.append(c2)
        new_accs.append(a2)
    return tuple(new_chunks), tuple(new_accs)


def step_mono(table, acc, uniq, key):
    rows = jnp.take(table, uniq, axis=0)
    grads = loss_grads(rows, key)
    sum_rows = jnp.take(acc, uniq, axis=0)
    new_sum = sum_rows + grads * grads
    upd = grads / (jnp.sqrt(new_sum) + EPS)
    acc = acc.at[uniq].add(grads * grads, indices_are_sorted=True)
    table = table.at[uniq].add(-LR * upd, indices_are_sorted=True)
    return table, acc


def main():
    variant = sys.argv[1]
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    uniqs = [make_uniq(rng, V) for _ in range(4)]

    if variant == "mono_dispatch":
        table = jnp.zeros((V, D), jnp.float32) + 0.01
        acc = jnp.zeros((V, D), jnp.float32)
        f = jax.jit(step_mono, donate_argnums=(0, 1))
        table, acc = f(table, acc, uniqs[0], key)
        jax.block_until_ready(table)
        t0 = time.perf_counter()
        for i in range(STEPS):
            table, acc = f(table, acc, uniqs[i % 4], key)
        jax.block_until_ready(table)
        dt = (time.perf_counter() - t0) / STEPS
    elif variant in ("chunk_dispatch", "chunk_scan"):
        vc = V // K
        chunks = tuple(jnp.zeros((vc, D), jnp.float32) + 0.01
                       for _ in range(K))
        accs = tuple(jnp.zeros((vc, D), jnp.float32) for _ in range(K))
        if variant == "chunk_dispatch":
            f = jax.jit(step_chunked, donate_argnums=(0, 1),
                        static_argnums=(4,))
            chunks, accs = f(chunks, accs, uniqs[0], key, vc)
            jax.block_until_ready(chunks)
            t0 = time.perf_counter()
            for i in range(STEPS):
                chunks, accs = f(chunks, accs, uniqs[i % 4], key, vc)
            jax.block_until_ready(chunks)
            dt = (time.perf_counter() - t0) / STEPS
        else:
            stacked_uniq = jnp.stack(uniqs)

            def many(chunks, accs, su):
                def body(carry, i):
                    ch, ac = carry
                    ch, ac = step_chunked(ch, ac, su[i % 4], key, vc)
                    return (ch, ac), 0.0

                (ch, ac), _ = jax.lax.scan(
                    body, (chunks, accs), jnp.arange(STEPS)
                )
                return ch, ac

            f = jax.jit(many, donate_argnums=(0, 1))
            chunks, accs = f(chunks, accs, stacked_uniq)
            jax.block_until_ready(chunks)
            t0 = time.perf_counter()
            chunks, accs = f(chunks, accs, stacked_uniq)
            jax.block_until_ready(chunks)
            dt = (time.perf_counter() - t0) / STEPS
    elif variant == "gather_only":
        vc = V // K
        chunks = tuple(jnp.zeros((vc, D), jnp.float32) + 0.01
                       for _ in range(K))

        def g(chunks, uniq):
            return gather_chunks(chunks, uniq, vc)

        f = jax.jit(g, static_argnums=())
        r = f(chunks, uniqs[0])
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(STEPS):
            r = f(chunks, uniqs[i % 4])
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / STEPS
    else:
        raise SystemExit(f"unknown variant {variant}")

    print(json.dumps({
        "variant": variant, "K": K, "step_ms": round(dt * 1e3, 3),
        "survived": True,
    }), flush=True)


if __name__ == "__main__":
    main()
