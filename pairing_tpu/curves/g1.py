"""Batched BN254 G1 (E: y^2 = x^3 + 3 over Fq), affine coordinates.

Replaces the reference's ``G1Affine``/``G1Target`` (SURVEY.md §2.3 C11/C14).
G1 points are pairing *inputs* only (the Miller loop never moves them), so
only construction, negation and validation are needed.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax

from ..fields import fp as F
from ..fields.fp import Fp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class G1:
    """Affine point batch; coordinates in the Montgomery domain."""

    x: Fp
    y: Fp

    def tree_flatten(self):
        return (self.x, self.y), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def batch_shape(self):
        return self.x.batch_shape


def g1_from_ints(points: Sequence[Tuple[int, int]]) -> G1:
    """[(x, y), ...] host ints -> G1 batch."""
    xs = F.fp_from_ints_mont([p[0] for p in points])
    ys = F.fp_from_ints_mont([p[1] for p in points])
    return G1(xs, ys)


def g1_to_ints(p: G1):
    xs = F.fp_to_ints(F.canonical(F.from_mont(p.x)))
    ys = F.fp_to_ints(F.canonical(F.from_mont(p.y)))
    return [(int(a), int(b)) for a, b in zip(xs.reshape(-1), ys.reshape(-1))]


def g1_neg(p: G1) -> G1:
    return G1(p.x, F.fp_neg(p.y))


def g1_on_curve(p: G1):
    """y^2 == x^3 + 3 (the reference never validates inputs; we expose it)."""
    y2 = F.mont_mul(p.y, p.y)
    x3 = F.mont_mul(F.mont_mul(p.x, p.x), p.x)
    rhs = F.fp_add(x3, F.fp_const_mont(3, p.batch_shape))
    return F.fp_eq(y2, rhs)
