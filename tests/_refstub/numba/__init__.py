"""Minimal pure-Python stand-in for :mod:`numba`, used ONLY by the
reference-parity tests (tests/test_reference_parity.py).

The upstream reference (/root/reference) decorates its solver kernels with
``@nba.jit(<signature>, nopython=True, nogil=True, cache=True)``
(reference mf_utils.py:218-224, 284-287, 399-403, 466-469, 2758-2761).
Numba is not installable in this environment, so this stub makes those
decorators no-ops: the decorated functions run as plain Python/NumPy, which
is slow but bit-identical in semantics — exactly what a differential parity
test needs.

Only the surface the reference actually touches is provided:
``jit``, ``njit``, ``prange``, and the ``types``/dtype signature objects
(``float64``, ``int32``, ``int64``, ``types.Tuple`` and friends), which the
reference only uses to *build* eager signatures; here they are inert objects
that tolerate ``[:]`` slicing, calls, and attribute access.
"""


class _Type:
    """Inert signature object: any slicing/call/attribute returns a _Type."""

    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self


float32 = _Type()
float64 = _Type()
int32 = _Type()
int64 = _Type()
boolean = _Type()


class _Types:
    def __getattr__(self, name):
        return _Type()


types = _Types()


def jit(signature_or_function=None, **kwargs):
    """No-op replacement for numba.jit: run the function as pure Python."""
    if callable(signature_or_function) and not isinstance(
            signature_or_function, _Type):
        return signature_or_function  # @jit with no arguments

    def decorator(func):
        return func

    return decorator


njit = jit
prange = range
