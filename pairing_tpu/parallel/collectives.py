"""Multiplicative Fq12 collectives over the device mesh.

The reference has no distributed layer (SURVEY.md §2.4); these are the
TPU-native constructs it implies:

  - P3: a *multiplicative* all-reduce (the reduction op is Fq12
    multiplication — associative, commutative, and exact over Z/p, so any
    reduction order is bit-identical) used to combine per-shard partial
    Miller accumulators of a large multi-pairing product;
  - implemented as a log-depth ppermute butterfly over ICI, no NCCL/MPI.
"""

from __future__ import annotations

import jax
from jax import lax

from ..fields import fp12 as F12
from ..fields.fp12 import Fq12
from ..pairing.miller_loop import fq12_cap


def fq12_all_reduce_mul(f: Fq12, axis_name: str) -> Fq12:
    """All-reduce by Fq12 multiplication along a shard_map mesh axis.

    Dispatches on the (static) axis size: a log-depth ppermute butterfly
    when the size is a power of two (mesh shapes on TPU pods are), the
    all-gather variant otherwise (e.g. a 3- or 6-wide axis on a partial
    slice). Both orders are bit-identical: Fq12 multiplication is exact
    over Z/p, associative, and commutative.
    """
    n = lax.axis_size(axis_name)
    if n & (n - 1) != 0:
        return fq12_reduce_mul_psum_style(f, axis_name)
    shift = 1
    while shift < n:
        perm = []
        for i in range(n):
            perm.append((i, i ^ shift))
        partner = jax.tree.map(
            lambda x: lax.ppermute(x, axis_name, perm), f
        )
        f = fq12_cap(F12.fq12_mul(f, partner))
        shift *= 2
    return f


def fq12_reduce_mul_psum_style(f: Fq12, axis_name: str) -> Fq12:
    """Alternative all-reduce via all_gather + local product (one hop).

    Better for small axis sizes / when latency of log rounds dominates.
    Produces the same bit-exact value as the butterfly.
    """
    gathered = jax.tree.map(
        lambda x: lax.all_gather(x, axis_name, axis=0), f
    )  # leading axis n
    n = lax.axis_size(axis_name)
    out = jax.tree.map(lambda x: x[0], gathered)
    for i in range(1, n):
        out = fq12_cap(
            F12.fq12_mul(out, jax.tree.map(lambda x: x[i], gathered))
        )
    return out
