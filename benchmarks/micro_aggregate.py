"""Microbenchmark: neighbor-aggregation strategies at FB15k-237 scale.

Compares, for out[v] = sum_{e: dst(e)=v} x[src(e)] * w_e:
  a) gather -> [E, d] messages -> segment_sum (current path)
  b) same with indices_are_sorted
  c) padded-CSR row-block gathers: neighbor lists chunked into [num_rows,
     K] (hub nodes span multiple rows), K gathers of [num_rows, d]
     accumulated without materializing [E, d], then a tiny sorted
     second-level segment_sum rows -> nodes
Forward and forward+backward (cotangent wrt x) variants.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)

    def many(args):
        def body(c, _):
            r = fn(*args)
            # carry a data dependence so scan iterations serialize
            return c + r[0, 0], None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    m = jax.jit(many)
    acc = m(args)
    float(acc)
    t0 = time.perf_counter()
    float(m(args))
    return (time.perf_counter() - t0) / iters


def build(E=272115, N=14541, d=200, K=16, seed=0):
    rng = np.random.default_rng(seed)
    src = np.sort(rng.integers(N, size=E)).astype(np.int32)
    nbr = rng.integers(N, size=E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    x = rng.standard_normal((N, d)).astype(np.float32)
    # padded CSR rows
    rows_nbr, rows_w, rows_node = [], [], []
    start = 0
    counts = np.bincount(src, minlength=N)
    offs = np.concatenate([[0], np.cumsum(counts)])
    for v in range(N):
        s, e = offs[v], offs[v + 1]
        for off in range(s, max(e, s + 1), K):
            chunk = slice(off, min(off + K, e))
            nb = np.zeros(K, np.int32)
            ww = np.zeros(K, np.float32)
            c = nbr[chunk]
            nb[: len(c)] = c
            ww[: len(c)] = w[chunk]
            rows_nbr.append(nb)
            rows_w.append(ww)
            rows_node.append(v)
    rows_nbr = np.stack(rows_nbr)
    rows_w = np.stack(rows_w)
    rows_node = np.asarray(rows_node, np.int32)
    pad = rows_nbr.size / E
    return (jnp.asarray(x), jnp.asarray(src), jnp.asarray(nbr),
            jnp.asarray(w), jnp.asarray(rows_nbr), jnp.asarray(rows_w),
            jnp.asarray(rows_node), N, K, pad)


def main():
    x, src, nbr, w, rows_nbr, rows_w, rows_node, N, K, pad = build()
    print(f"padding factor {pad:.2f}")

    def agg_scatter(x, sorted_):
        msg = jnp.take(x, nbr, axis=0) * w[:, None]
        return jax.ops.segment_sum(msg, src, num_segments=N,
                                   indices_are_sorted=sorted_)

    def agg_rows(x):
        acc = jnp.zeros((rows_nbr.shape[0], x.shape[1]), x.dtype)
        for k in range(K):
            acc = acc + jnp.take(x, rows_nbr[:, k], axis=0) \
                * rows_w[:, k][:, None]
        return jax.ops.segment_sum(acc, rows_node, num_segments=N,
                                   indices_are_sorted=True)

    f_a = jax.jit(lambda x: agg_scatter(x, False))
    f_b = jax.jit(lambda x: agg_scatter(x, True))
    f_c = jax.jit(agg_rows)
    g_a = jax.jit(lambda x: jax.grad(
        lambda x: agg_scatter(x, False).sum())(x))
    g_c = jax.jit(lambda x: jax.grad(lambda x: agg_rows(x).sum())(x))

    for name, f in [("scatter", f_a), ("row_blocks", f_c),
                    ("scatter_fwd+bwd", g_a),
                    ("row_blocks_fwd+bwd", g_c)]:
        dt = timeit(f, x)
        print(f"{name:22s} {dt * 1e3:7.2f} ms")
        np.testing.assert_allclose(
            np.asarray(f(x))[:2, :2] if "bwd" not in name else 0,
            np.asarray(f_a(x))[:2, :2] if "bwd" not in name else 0,
            rtol=1e-3,
        )


if __name__ == "__main__":
    main()
