"""Probe: row-gather/scatter throughput vs array tiling (GNN roofline,
VERDICT r4 item 3).

The CompGCN step's top sink is the row-block gather-accumulate: jnp.take
of ~295k random 800 B rows from the [N, 200] f32 node table per
mode/layer/direction. On TPU a f32 array tiles as T(8,128), so a single
logical row pulls whole 4 KiB tiles -> ~8-10x read amplification. An
[N, 1, 200] view tiles as T(1,128) (512 B tiles), which should cut the
amplification to ~1.3x. This probe measures take/segment_sum on both
layouts at the bench shape.

Usage: python probe_gather_layout.py
"""

import json
import time

import numpy as np


def timed(fn, *args, iters=8):
    """Per-call seconds. block_until_ready returns at DISPATCH time
    over the remote tunnel (see harness.py), so each call must be
    forced by a scalar fetch; the functions here all return scalars."""
    float(fn(*args))  # compile + run
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        val = float(out)  # forces device execution + transfer
    del val
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    N, D = 14541, 200
    ROWS, K = 24532, 12
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, N, size=(ROWS, K)), jnp.int32)
    scale = jnp.asarray(rng.random(ROWS * K), jnp.float32)
    pos = jnp.asarray(
        rng.integers(0, ROWS * K, size=(ROWS, K)), jnp.int32
    )
    # sorted destination ids (row blocks are destination-sorted)
    node = jnp.asarray(np.sort(rng.integers(0, N, size=ROWS)), jnp.int32)

    def scan16(fn):
        def many(*args):
            def body(c, i):
                return c + fn(*args), 0.0
            tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(16))
            return tot
        return jax.jit(many)

    results = {}

    # A: plain 2-D gather-accumulate + segment_sum (current form)
    def acc2d(xw, nbr, pos, scale, node):
        acc = jnp.zeros((ROWS, D), jnp.float32)
        for k in range(K):
            s = jnp.take(scale, pos[:, k])
            acc = acc + jnp.take(xw, nbr[:, k], axis=0) * s[:, None]
        return jnp.sum(jax.ops.segment_sum(
            acc, node, N, indices_are_sorted=True))

    results["acc2d_ms"] = timed(scan16(acc2d), xw, nbr, pos, scale,
                                node) / 16 * 1e3

    # B: same math through the [N, 1, D] T(1,128) view
    def acc3d(xw, nbr, pos, scale, node):
        xw3 = xw.reshape(N, 1, D)
        acc = jnp.zeros((ROWS, 1, D), jnp.float32)
        for k in range(K):
            s = jnp.take(scale, pos[:, k])
            acc = acc + jnp.take(xw3, nbr[:, k], axis=0) \
                * s[:, None, None]
        out = jax.ops.segment_sum(acc, node, N, indices_are_sorted=True)
        return jnp.sum(out)

    results["acc3d_ms"] = timed(scan16(acc3d), xw, nbr, pos, scale,
                                node) / 16 * 1e3

    # C: pure gather cost, both layouts
    def take2d(xw, nbr):
        return jnp.sum(jnp.take(xw, nbr[:, 0], axis=0))

    def take3d(xw, nbr):
        return jnp.sum(jnp.take(xw.reshape(N, 1, D), nbr[:, 0], axis=0))

    results["take2d_ms"] = timed(scan16(take2d), xw, nbr) / 16 * 1e3
    results["take3d_ms"] = timed(scan16(take3d), xw, nbr) / 16 * 1e3

    # D: bf16 variants of the winner shapes
    xwb = xw.astype(jnp.bfloat16)

    def acc3d_bf16(xw, nbr, pos, scale, node):
        xw3 = xw.reshape(N, 1, D)
        acc = jnp.zeros((ROWS, 1, D), jnp.float32)
        for k in range(K):
            s = jnp.take(scale, pos[:, k])
            acc = acc + jnp.take(xw3, nbr[:, k], axis=0).astype(
                jnp.float32) * s[:, None, None]
        return jnp.sum(jax.ops.segment_sum(
            acc, node, N, indices_are_sorted=True))

    results["acc3d_bf16_ms"] = timed(
        scan16(acc3d_bf16), xwb, nbr, pos, scale, node) / 16 * 1e3

    for k, v in results.items():
        results[k] = round(v, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
