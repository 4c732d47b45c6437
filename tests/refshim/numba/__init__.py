"""Minimal pure-Python ``numba`` shim so the PyTorch reference implementation
(/root/reference/kge) can be imported for numerical parity testing.

The reference uses numba in exactly two ways (kge/indexing.py:56,112,464 and
kge/util/sampler.py:716,726): ``@numba.njit`` as a JIT decorator on plain
numpy functions, and ``numba.typed.Dict`` as a typed hash map. Both have
exact pure-Python equivalents — the decorated functions are valid Python and
``dict`` satisfies the typed.Dict API surface the reference touches
(construction, __setitem__, .get). This shim exists ONLY under tests/refshim
and is inserted into sys.path by the parity tests; it is not part of
kge_tpu.
"""


def njit(*args, **kwargs):
    """Identity decorator supporting both @njit and @njit(...) forms."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def decorate(fn):
        return fn

    return decorate


jit = njit


class _TypedDict(dict):
    """dict with numba.typed.Dict's classmethod constructor."""

    @classmethod
    def empty(cls, key_type=None, value_type=None):
        return cls()


class _TypedList(list):
    @classmethod
    def empty_list(cls, item_type=None):
        return cls()


class typed:  # noqa: N801 - mimics the numba.typed submodule
    Dict = _TypedDict
    List = _TypedList


class _AnyType:
    """Stand-in for numba.types.* attributes (never semantically used)."""

    def __getattr__(self, name):
        return _AnyType()

    def __call__(self, *args, **kwargs):
        return _AnyType()

    def __getitem__(self, item):
        return _AnyType()


types = _AnyType()
