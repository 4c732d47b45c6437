"""Native (C++) host-side kernels, compiled on demand.

The TPU compute path is jax/XLA/pallas; the host runtime around it uses
native code where the reference does (numba kernels, vendored C++
scatter ops). hostops.cpp builds once per checkout with g++ into
_hostops.so next to the source (ctypes binding — no pybind11
dependency); every entry point raises cleanly when the toolchain is
missing and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()


def _lib():
    global _LIB
    with _LOCK:
        if isinstance(_LIB, Exception):
            # negative cache: a failed build would otherwise re-run the
            # multi-second g++ invocation on EVERY native-helper call
            raise RuntimeError(str(_LIB))
        if _LIB is not None:
            return _LIB
        import hashlib

        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "hostops.cpp")
        so = os.path.join(here, "_hostops.so")
        stamp = so + ".sha"
        # rebuild keyed on a SOURCE HASH stamp, not mtimes: git checkouts
        # do not preserve mtimes, so a stale (or foreign-architecture)
        # binary would otherwise be loaded silently
        with open(src, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        built = os.path.isfile(so)
        if built:
            try:
                with open(stamp) as f:
                    built = f.read().strip() == src_hash
            except OSError:
                built = False
        if not built:
            tmp = so + f".tmp-{os.getpid()}"
            try:
                r = subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                    capture_output=True, text=True,
                )
            except OSError as e:
                _LIB = RuntimeError(
                    f"native build unavailable (no g++: {e}); callers "
                    "fall back to numpy"
                )
                raise RuntimeError(str(_LIB)) from e
            if r.returncode != 0:
                _LIB = RuntimeError(
                    f"native build failed: {r.stderr[-1000:]}"
                )
                raise RuntimeError(str(_LIB))
            os.replace(tmp, so)  # atomic: concurrent builders race safely
            with open(stamp + f".tmp-{os.getpid()}", "w") as f:
                f.write(src_hash)
            os.replace(stamp + f".tmp-{os.getpid()}", stamp)
        lib = ctypes.CDLL(so)
        lib.parse_triples.restype = ctypes.c_long
        lib.parse_triples.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long,
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.row_blocks_total.restype = ctypes.c_long
        lib.row_blocks_total.argtypes = [
            i32p, ctypes.c_long, ctypes.c_long, ctypes.c_long, i64p,
        ]
        lib.row_blocks_fill.restype = ctypes.c_long
        lib.row_blocks_fill.argtypes = [
            i32p, i32p, i32p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, i64p, i32p, i32p, i32p, i32p, ctypes.c_long,
        ]
        lib.counting_argsort.restype = ctypes.c_long
        lib.counting_argsort.argtypes = [
            i32p, ctypes.c_long, ctypes.c_long, i64p,
        ]
        lib.row_blocks_transpose_fill.restype = ctypes.c_long
        lib.row_blocks_transpose_fill.argtypes = [
            i32p, i32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, i64p, i64p, i32p, i32p, i32p, ctypes.c_long,
        ]
        _LIB = lib
        return lib


def load_triples_native(path: str) -> np.ndarray:
    """[N, 3] int32 triples from a whitespace-separated .del file
    (first three integer fields per line; extra fields ignored)."""
    lib = _lib()
    size = os.path.getsize(path)
    max_rows = size // 6 + 2  # minimal line "0\t0\t0\n" is 6 bytes
    out = np.empty((max_rows, 3), dtype=np.int32)
    n = lib.parse_triples(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_rows,
    )
    if n < 0:
        raise RuntimeError(
            f"native triple parse failed (rc={n}) for {path}"
        )
    return np.ascontiguousarray(out[:n])


def _row_blocks_fwd(agg, nbr, typ, pos, num_nodes: int, K: int):
    """Shared forward-fill core: returns (blocks dict, counts) with the
    per-node edge counts the transpose pass also needs. Inputs must be
    contiguous int32/int32/int32/int64 arrays."""
    lib = _lib()
    E = int(agg.shape[0])
    counts = np.empty(max(num_nodes, 1), dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    total = lib.row_blocks_total(
        agg.ctypes.data_as(i32p), E, num_nodes, K,
        counts.ctypes.data_as(i64p),
    )
    if total < 0:
        raise RuntimeError(f"row_blocks_total failed (rc={total})")
    nbr_out = np.empty((total, K), dtype=np.int32)
    typ_out = np.empty((total, K), dtype=np.int32)
    pos_out = np.empty((total, K), dtype=np.int32)
    node_out = np.empty(total, dtype=np.int32)
    rc = lib.row_blocks_fill(
        agg.ctypes.data_as(i32p), nbr.ctypes.data_as(i32p),
        typ.ctypes.data_as(i32p), pos.ctypes.data_as(i64p),
        E, num_nodes, K, counts.ctypes.data_as(i64p),
        nbr_out.ctypes.data_as(i32p), typ_out.ctypes.data_as(i32p),
        pos_out.ctypes.data_as(i32p), node_out.ctypes.data_as(i32p),
        total,
    )
    if rc != 0:
        raise RuntimeError(f"row_blocks_fill failed (rc={rc})")
    return ({"nbr": nbr_out, "type": typ_out, "pos": pos_out,
             "node": node_out}, counts)


def row_blocks_native(agg_nodes: np.ndarray, nbr_nodes: np.ndarray,
                      types: np.ndarray, positions: np.ndarray,
                      num_nodes: int, K: int) -> dict:
    """Padded-CSR row blocks via the O(E) C++ counting sort — same
    output contract as encoder._row_blocks' numpy path (bitwise; the
    stability contract matches argsort(kind="stable"))."""
    fwd, _ = _row_blocks_fwd(
        np.ascontiguousarray(agg_nodes, dtype=np.int32),
        np.ascontiguousarray(nbr_nodes, dtype=np.int32),
        np.ascontiguousarray(types, dtype=np.int32),
        np.ascontiguousarray(positions, dtype=np.int64),
        num_nodes, K,
    )
    return fwd


def counting_argsort_native(keys: np.ndarray, num_buckets: int
                            ) -> np.ndarray:
    """Stable argsort of int keys in [0, num_buckets) — O(E + N), the
    numpy argsort(kind="stable") equivalent for node-id keys."""
    lib = _lib()
    k = np.ascontiguousarray(keys, dtype=np.int32)
    order = np.empty(k.shape[0], dtype=np.int64)
    rc = lib.counting_argsort(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        k.shape[0], num_buckets,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"counting_argsort failed (rc={rc})")
    return order


def row_blocks_with_transpose_native(
        agg_nodes: np.ndarray, nbr_nodes: np.ndarray, types: np.ndarray,
        positions: np.ndarray, num_nodes: int, K: int):
    """Forward AND transpose padded-CSR row blocks in one native pass —
    the transpose (neighbor -> forward-row incidence, used by the
    symmetric backward) never materializes the numpy boolean masks.
    Returns (fwd_dict, trow, tpos, tnode)."""
    lib = _lib()
    E = int(agg_nodes.shape[0])
    agg = np.ascontiguousarray(agg_nodes, dtype=np.int32)
    nbr = np.ascontiguousarray(nbr_nodes, dtype=np.int32)
    typ = np.ascontiguousarray(types, dtype=np.int32)
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    fwd, counts_f = _row_blocks_fwd(agg, nbr, typ, pos, num_nodes, K)
    counts_t = np.empty(max(num_nodes, 1), dtype=np.int64)
    total_t = lib.row_blocks_total(
        nbr.ctypes.data_as(i32p), E, num_nodes, K,
        counts_t.ctypes.data_as(i64p),
    )
    if total_t < 0:
        raise RuntimeError(f"row_blocks_total failed (rc={total_t})")
    order = np.empty(E, dtype=np.int64)
    rc = lib.counting_argsort(
        agg.ctypes.data_as(i32p), E, num_nodes,
        order.ctypes.data_as(i64p),
    )
    if rc != 0:
        raise RuntimeError(f"counting_argsort failed (rc={rc})")
    trow = np.empty((total_t, K), dtype=np.int32)
    tpos = np.empty((total_t, K), dtype=np.int32)
    tnode = np.empty(total_t, dtype=np.int32)
    rc = lib.row_blocks_transpose_fill(
        agg.ctypes.data_as(i32p), nbr.ctypes.data_as(i32p),
        pos.ctypes.data_as(i64p), order.ctypes.data_as(i64p),
        E, num_nodes, K, counts_f.ctypes.data_as(i64p),
        counts_t.ctypes.data_as(i64p),
        trow.ctypes.data_as(i32p), tpos.ctypes.data_as(i32p),
        tnode.ctypes.data_as(i32p), total_t,
    )
    if rc != 0:
        raise RuntimeError(f"row_blocks_transpose_fill failed (rc={rc})")
    return fwd, trow, tpos, tnode
