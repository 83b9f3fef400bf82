"""Code-keyed identity for user callbacks in program-cache keys.

``jax.jit`` static args and ``lru_cache`` keys compare functions by
object identity, so a caller passing a fresh-but-identical lambda per
invocation (the natural style) silently recompiles the whole program
every call. Two Python functions with the same code object, defaults and
closure values trace identically — key on those instead.
"""

from __future__ import annotations

__all__ = ["fn_cache_key", "HashableFn"]


def fn_cache_key(fn):
    """A cache key for ``fn`` that survives re-created lambdas.

    Unhashable closure cells fall back to object identity (conservative:
    may still miss, never aliases two different traces). C callables key
    by identity.
    """
    code = getattr(fn, "__code__", None)
    if code is None:
        return fn

    def _cell_key(value):
        try:
            hash(value)
        except TypeError:
            return ("id", id(value))
        return ("hash", value)

    cells = getattr(fn, "__closure__", None) or ()
    defaults = getattr(fn, "__defaults__", None) or ()
    return (
        code,
        tuple(_cell_key(c.cell_contents) for c in cells),
        tuple(_cell_key(d) for d in defaults),
    )


class HashableFn:
    """Wrap a callback so jit static-arg hashing uses :func:`fn_cache_key`.

    Two wrappers around code-identical functions compare equal, so the
    jit cache hits; the wrapped function is still what gets traced.
    """

    __slots__ = ("fn", "_key")

    def __init__(self, fn):
        self.fn = fn
        self._key = fn_cache_key(fn)

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    def __hash__(self):
        return hash((HashableFn, self._key[0] if isinstance(self._key, tuple)
                     else id(self._key)))

    def __eq__(self, other):
        return isinstance(other, HashableFn) and self._key == other._key
