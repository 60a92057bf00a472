"""Process-wide jit cache for Pallas kernel wrappers.

Tracing a v2 product-core kernel body builds O(10^5) jaxpr equations, and
the final-exp chain alone has ~35 kernel call sites — re-tracing the body
at every call site made tracing the full pairing take ~20 minutes.
Wrapping each kernel entry in a cached ``jax.jit`` makes every further
call site (inside the same or any other outer jit, for the same kernel
shapes) reuse the already-traced jaxpr, so each kernel body is traced
once per process per shape.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

_CACHE: Dict[Tuple, Callable] = {}


def cached_jit(key: Tuple, make: Callable[[], Callable]) -> Callable:
    """Return a jitted version of ``make()``, cached on ``key``.

    ``key`` must capture everything static that changes the traced
    function (op name, interpret flag, static slot patterns, digit
    schedules) — array shapes are handled by jax.jit's own cache.
    """
    fn = _CACHE.get(key)
    if fn is None:
        fn = _CACHE[key] = jax.jit(make())
    return fn
