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
                raise RuntimeError(
                    f"native build unavailable (no g++: {e}); callers "
                    "fall back to numpy"
                ) from e
            if r.returncode != 0:
                raise RuntimeError(
                    f"native build failed: {r.stderr[-1000:]}"
                )
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
