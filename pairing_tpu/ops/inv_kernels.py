"""Fq12 inversion as two fq2_vm programs + one Fermat ladder.

The tower inversion (fields.fp12.fq12_inv) is ~60 *sequential* Fq2 ops —
slow as an XLA op chain. Here it runs as:

  part 1 (VM): Fq6 norms down the tower -> (norm in Fq2, t0, t1, t2)
  middle     : ninv = norm^{-1}  (one pallas Fermat ladder inside F2.inv)
  part 2 (VM): multiply through -> the 6 output slots

Value-identical to the XLA path (inverse is unique).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import fp as F
from ..fields import fp2 as F2
from ..fields.fp12 import Fq12
from ..utils.bn254 import P
from .fq2_vm import Fq2Assembler, fp2s_to_vm, vm_apply, vm_to_fp2s


def _fq6_mul(a: Fq2Assembler, dst, x, y, tmps):
    u0, u1 = tmps
    # c0 = x0 y0 + xi (x1 y2 + x2 y1)
    a.mul(u0, x[1], y[2])
    a.mul(u1, x[2], y[1])
    a.add(u0, u0, u1)
    a.mul_w6(u0, u0)
    a.mul(u1, x[0], y[0])
    a.add(dst[0], u0, u1)
    # c1 = x0 y1 + x1 y0 + xi x2 y2
    a.mul(u0, x[0], y[1])
    a.mul(u1, x[1], y[0])
    a.add(u0, u0, u1)
    a.mul(u1, x[2], y[2])
    a.mul_w6(u1, u1)
    a.add(dst[1], u0, u1)
    # c2 = x0 y2 + x2 y0 + x1 y1
    a.mul(u0, x[0], y[2])
    a.mul(u1, x[2], y[0])
    a.add(u0, u0, u1)
    a.mul(u1, x[1], y[1])
    a.add(dst[2], u0, u1)


@lru_cache(maxsize=None)
def _part1() -> Tuple[np.ndarray, Tuple[int, ...], int]:
    """inputs s0..s5 -> outputs (norm, t0, t1, t2)."""
    NREG = 22
    a = Fq2Assembler(NREG)
    for r in range(6):
        a.set_bound(r, 2 * P)
    A = (0, 2, 4)
    B = (1, 3, 5)
    _fq6_mul(a, (6, 7, 8), A, A, (19, 20))  # A^2
    _fq6_mul(a, (9, 10, 11), B, B, (19, 20))  # B^2
    a.mul_w6(12, 11)  # b2v.c0 = xi * B2[2]
    # denom = A^2 - (b2v) where b2v = (12, 9, 10)
    a.sub(13, 6, 12)
    a.sub(14, 7, 9)
    a.sub(15, 8, 10)
    # Fq6 inverse partials on (13, 14, 15)
    a.sq(16, 13)
    a.mul(17, 14, 15)
    a.mul_w6(17, 17)
    a.sub(16, 16, 17)  # t0
    a.sq(17, 15)
    a.mul_w6(17, 17)
    a.mul(18, 13, 14)
    a.sub(17, 17, 18)  # t1
    a.sq(18, 14)
    a.mul(19, 13, 15)
    a.sub(18, 18, 19)  # t2
    a.mul(19, 13, 16)  # c0 t0
    a.mul(20, 14, 18)  # c1 t2
    a.mul(21, 15, 17)  # c2 t1
    a.add(20, 20, 21)
    a.mul_w6(20, 20)
    a.add(19, 19, 20)  # norm
    for r in (19, 16, 17, 18):
        a.cap(r)
    return a.table(), (19, 16, 17, 18), NREG


@lru_cache(maxsize=None)
def _part2() -> Tuple[np.ndarray, Tuple[int, ...], int]:
    """inputs s0..s5, t0, t1, t2, ninv, zero -> output slots."""
    NREG = 24
    a = Fq2Assembler(NREG)
    for r in range(10):
        a.set_bound(r, 2 * P)
    a.set_bound(10, 1)  # zero register
    A = (0, 2, 4)
    B = (1, 3, 5)
    # T = t_i * ninv
    a.mul(11, 6, 9)
    a.mul(12, 7, 9)
    a.mul(13, 8, 9)
    T = (11, 12, 13)
    _fq6_mul(a, (14, 15, 16), A, T, (20, 21))  # out_a
    _fq6_mul(a, (17, 18, 19), B, T, (20, 21))  # B * T
    # out_b = -(B*T)
    a.sub(20, 10, 17)
    a.sub(21, 10, 18)
    a.sub(22, 10, 19)
    for r in (14, 15, 16, 20, 21, 22):
        a.cap(r)
    # slot order: (a0, b0, a1, b1, a2, b2)
    return a.table(), (14, 20, 15, 21, 16, 22), NREG


def fq12_inv_pallas(x: Fq12) -> Fq12:
    slots = []
    for s in x.s:
        slots.append(s)
    in_arr, batch, pad = fp2s_to_vm(slots)
    prog1, outs1, nreg1 = _part1()
    part1 = vm_apply(prog1, in_arr, outs1, nreg1)
    norm, t0, t1, t2 = vm_to_fp2s(part1, batch, pad)
    ninv = F2.cap(F2.inv(norm))
    in2, _, _ = fp2s_to_vm(
        slots
        + [t0, t1, t2, ninv, F2.zero(batch)]
    )
    prog2, outs2, nreg2 = _part2()
    part2 = vm_apply(prog2, in2, outs2, nreg2)
    out = vm_to_fp2s(part2, batch, pad)
    return Fq12(tuple(out))
