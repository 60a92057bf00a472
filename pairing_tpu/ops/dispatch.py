"""Backend dispatch: Pallas kernels on TPU, XLA path elsewhere.

Set ``PAIRING_TPU_BACKEND=xla|pallas`` to force; default is pallas on TPU
(including interpret-mode off) and xla on CPU. All backends are
value-identical (same Montgomery envelope) — tests cross-check them.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax

_FORCED: Optional[str] = None


def backend() -> str:
    forced = _FORCED or os.environ.get("PAIRING_TPU_BACKEND")
    if forced in ("xla", "pallas"):
        return forced
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:  # pragma: no cover
        return "xla"


def force_backend(name: Optional[str]) -> None:
    """Force 'xla' or 'pallas' (None = auto). For tests/benchmarks."""
    global _FORCED
    assert name in (None, "xla", "pallas")
    _FORCED = name


def use_pallas() -> bool:
    return backend() == "pallas"


def fq12_mul(a, b):
    """Dense Fq12 product via the active backend."""
    if use_pallas():
        from .fq12_kernels import fq12_mul_pallas

        return fq12_mul_pallas(a, b)
    from ..fields import fp12 as F12

    return F12.fq12_mul(a, b)
