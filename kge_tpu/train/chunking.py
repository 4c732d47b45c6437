"""Row-chunked embedding tables for row-sparse training.

The v5e runtime faults on row scatters whose operand buffers are
multi-GiB (round-4/5 characterization, docs/STATUS.md): the fused
sparse step that is reliable at sub-GiB scale crashes the worker at
Wikidata5M scale (2.46 GiB entity table), and XLA additionally
materializes whole-table operand copies for big-buffer scatters
(~17 ms/step flat) where sub-limit buffers scatter in place.

The escape is representation, not scheduling: store the table (and its
Adagrad accumulator) as K row-chunks, each under
``tpu.sparse_scatter_limit_bytes``. Every chunk is a separate device
buffer, so gathers/scatters stay in the regime the platform handles in
place and reliably — measured on the real chip:
benchmarks/probe_chunked_sparse.py (chunked per-dispatch 0.08 ms,
chunked scanned 0.01 ms/step at w5m scale, vs 17 ms copying / crash
for the monolithic forms). Chunking also restores grouped dispatch
(``tpu.steps_per_dispatch``) at w5m scale: a lax.scan may carry
sub-limit chunks safely.

A chunked table leaf is a TUPLE of [rows_c, D] arrays (equal rows_c,
8-row aligned; the last chunk's tail rows are padding). Ids are global;
chunk k covers rows [k*rows_c, (k+1)*rows_c). The on-disk checkpoint
format is unchanged: tables are de-chunked before save and re-chunked
on load (kge_tpu/train/train.py).

Reference counterpart: the torch sparse-Adagrad path behind
``lookup_embedder.sparse`` (kge/model/embedder/lookup_embedder.yaml),
which needs no such machinery because torch mutates tables in place.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def chunk_rows(num_rows: int, num_chunks: int) -> int:
    """Rows per chunk: ceil split, 8-row aligned (Mosaic tile)."""
    per = -(-num_rows // num_chunks)
    return -(-per // 8) * 8


def num_chunks_for(table_bytes: int, limit_bytes: int) -> int:
    """Smallest K with per-chunk bytes under the limit."""
    if limit_bytes <= 0:
        return 1
    return max(1, -(-table_bytes // limit_bytes))


def chunk_table(table, num_chunks: int):
    """[V, D] array -> tuple of num_chunks [rows_c, D] arrays (device
    slices; the tail chunk zero-pads to rows_c)."""
    if num_chunks <= 1:
        return table
    v = table.shape[0]
    rows_c = chunk_rows(v, num_chunks)
    pad = rows_c * num_chunks - v
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)]
        )
    return tuple(
        table[k * rows_c:(k + 1) * rows_c] for k in range(num_chunks)
    )


def dechunk_table(chunks, num_rows: int):
    """Tuple of chunks -> one [num_rows, D] array (drops tail padding).
    Passes plain arrays through unchanged."""
    if not isinstance(chunks, tuple):
        return chunks
    return jnp.concatenate(list(chunks))[:num_rows]


def gather_rows(table, ids):
    """rows = table[ids] for a plain array OR a chunk tuple (masked
    per-chunk takes summed; each global id hits exactly one chunk)."""
    if not isinstance(table, tuple):
        return jnp.take(table, ids, axis=0)
    rows_c = table[0].shape[0]
    out = None
    for k, chunk in enumerate(table):
        local = ids - k * rows_c
        inb = (local >= 0) & (local < rows_c)
        part = jnp.take(
            chunk, jnp.clip(local, 0, rows_c - 1), axis=0
        ) * inb[:, None].astype(chunk.dtype)
        out = part if out is None else out + part
    return out


def scatter_rows_add(table, ids, delta):
    """table[ids] += delta for a plain array OR a chunk tuple. ``ids``
    must be sorted and distinct. Chunk handling mirrors
    KgeOptimizer.sparse_row_update: past-the-end locals are DROPPED by
    mode="drop"; negative locals clamp to 0 with masked (zeroed) values
    because drop mode only drops >= size (negatives would wrap), and
    the clamped prefix keeps the index vector sorted."""
    if not isinstance(table, tuple):
        return table.at[ids].add(delta, indices_are_sorted=True,
                                 unique_indices=True)
    rows_c = table[0].shape[0]
    out = []
    for k, chunk in enumerate(table):
        local = ids - k * rows_c
        idx = jnp.maximum(local, 0)
        mask = (local >= 0).astype(delta.dtype)[:, None]
        out.append(chunk.at[idx].add(delta * mask,
                                     indices_are_sorted=True, mode="drop"))
    return tuple(out)


def chunk_tree(params, chunk_spec: Dict[str, int]):
    """Convert the table leaves named in ``chunk_spec`` (dotted path ->
    K) from arrays to chunk tuples, in place on a nested-dict copy."""
    out = _copy_dicts(params)
    for path, k in chunk_spec.items():
        if k <= 1:
            continue
        parent, key = _resolve(out, path)
        parent[key] = chunk_table(parent[key], k)
    return out


def dechunk_tree(params, chunk_spec: Dict[str, int],
                 row_counts: Dict[str, int]):
    """Inverse of chunk_tree; ``row_counts`` maps path -> original row
    count (tail padding is dropped)."""
    out = _copy_dicts(params)
    for path, k in chunk_spec.items():
        if k <= 1:
            continue
        parent, key = _resolve(out, path)
        parent[key] = dechunk_table(parent[key], row_counts[path])
    return out


def _copy_dicts(tree):
    if isinstance(tree, dict):
        return {k: _copy_dicts(v) for k, v in tree.items()}
    return tree


def _resolve(tree, path: str) -> Tuple[dict, str]:
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    return node, parts[-1]
