"""Code-keyed identity for user callbacks in program-cache keys.

``jax.jit`` static args and ``lru_cache`` keys compare functions by
object identity, so a caller passing a fresh-but-identical lambda per
invocation (the natural style) silently recompiles the whole program
every call. Two Python functions with the same code object, defaults and
closure values trace identically — key on those instead.
"""

from __future__ import annotations

__all__ = ["fn_cache_key", "HashableFn"]


def _value_key(value):
    try:
        hash(value)
    except TypeError:
        return ("id", id(value))
    return ("hash", value)


def _referenced_global_names(code, seen=None):
    """Names the code object (and nested code objects) may read as globals."""
    if seen is None:
        seen = set()
    seen.update(code.co_names)
    for const in code.co_consts:
        if hasattr(const, "co_names"):  # nested lambda/def
            _referenced_global_names(const, seen)
    return seen


def fn_cache_key(fn):
    """A cache key for ``fn`` that survives re-created lambdas.

    The key covers everything that can change what the function traces to:
    the code object, closure cell values, defaults, the bound instance for
    methods (two instances' bound methods share one ``__code__`` but close
    over different state — keyed by identity; the cache retains the
    function, so the instance outlives the entry and its id cannot be
    recycled into an alias), and the values of any module globals the code
    references (a fresh lambda reading a rebound global must re-trace).
    Unhashable values fall back to object identity (conservative: may
    still miss, never aliases two different traces). C callables key by
    identity.
    """
    code = getattr(fn, "__code__", None)
    if code is None:
        return fn

    # Bound methods delegate __code__ but not __globals__ — unwrap.
    target = getattr(fn, "__func__", fn)
    cells = getattr(target, "__closure__", None) or ()
    defaults = getattr(target, "__defaults__", None) or ()
    self_obj = getattr(fn, "__self__", None)
    fglobals = getattr(target, "__globals__", {})
    global_items = tuple(sorted(
        (name, _value_key(fglobals[name]))
        for name in _referenced_global_names(code) if name in fglobals
    ))
    return (
        code,
        tuple(_value_key(c.cell_contents) for c in cells),
        tuple(_value_key(d) for d in defaults),
        None if self_obj is None else ("self", id(self_obj)),
        global_items,
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
