"""Batched line-function evaluation for the optimal-ate Miller loop.

Mirrors the reference's sparse line kernels (SURVEY.md §2.2):
  - tangent ("equal", slots {0,3,4}):   miller_loop_native.rs:30-44
  - chord ("unequal", slots {2,3,5}):   miller_loop_native.rs:10-28

Inputs are affine G2 points (possibly stacked along a leading trajectory
axis) and the G1 evaluation point; outputs are 3 Fq2 coefficients per line.
"""

from __future__ import annotations

from typing import Tuple

from ..fields import fp as F
from ..fields import fp2 as F2
from ..fields.fp import Fp
from ..fields.fp2 import Fp2

#: line coefficient triples are ordered by ascending slot index
EQUAL_SLOTS = (0, 3, 4)
UNEQUAL_SLOTS = (2, 3, 5)


def line_equal(qx: Fp2, qy: Fp2, px: Fp, py: Fp) -> Tuple[Fp2, Fp2, Fp2]:
    """Tangent line at (qx, qy) evaluated at (px, py).

    out0 = (3 x^3 - 2 y^2) * xi,  out3 = 2 y * Py,  out4 = -3 x^2 * Px.
    Returns (out0, out3, out4).
    """
    x_sq = F2.square(qx)
    three_x_cu = F2.scale(F2.mul(x_sq, qx), 3)
    two_y_sq = F2.scale(F2.square(qy), 2)
    out0 = F2.mul_w6(F2.sub(three_x_cu, two_y_sq))
    out4 = F2.neg(F2.scale(F2.mul_fp(x_sq, px), 3))
    out3 = F2.scale(F2.mul_fp(qy, py), 2)
    return (F2.cap(out0), F2.cap(out3), F2.cap(out4))


def line_unequal(
    q1x: Fp2, q1y: Fp2, q2x: Fp2, q2y: Fp2, px: Fp, py: Fp
) -> Tuple[Fp2, Fp2, Fp2]:
    """Chord line through (q1, q2) evaluated at (px, py).

    out2 = (x2 - x1) * Py,  out3 = (y1 - y2) * Px,  out5 = x1 y2 - x2 y1.
    Returns (out2, out3, out5).
    """
    out3 = F2.mul_fp(F2.sub(q1y, q2y), px)
    out2 = F2.mul_fp(F2.sub(q2x, q1x), py)
    out5 = F2.sub(F2.mul(q1x, q2y), F2.mul(q2x, q1y))
    return (F2.cap(out2), F2.cap(out3), F2.cap(out5))
