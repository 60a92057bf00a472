"""In-kernel limb arithmetic for Pallas TPU kernels.

Conventions:
  * An Fq element inside a kernel is a Python list of NLIMBS int32 tiles,
    each of shape [8, 128] (one VPU tile; batch = 1024 lanes per tile).
    Limb loops are unrolled at trace time — every op below is a straight
    sequence of vector instructions on the VPU, no cross-lane shuffles.
  * The value envelope matches the XLA path: inputs/outputs are
    (bound <= 2p, limbs <= 2^13+1) "settled" representations in the
    Montgomery domain, so kernel and XLA layers interoperate freely.

These helpers mirror pairing_tpu.fields.fp (same radix/Montgomery
constants) — see that module for the bound proofs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..fields.fp import (
    MASK,
    NLIMBS,
    NPRIME_LIMBS,
    P_LIMBS,
    RADIX,
    RADIX_BITS,
    SETTLED,
)
from ..utils.bn254 import P

WIDE = 2 * NLIMBS + 2  # 44
_I31 = (1 << 31) - 1

P_INT = [int(x) for x in P_LIMBS]
NP_INT = [int(x) for x in NPRIME_LIMBS]

# kp constants for in-kernel subtraction (value-level k*p, 22 limbs)
from ..fields.fp import _const_limbs

KP2 = [int(x) for x in _const_limbs(2 * P, NLIMBS + 1)]
KP4 = [int(x) for x in _const_limbs(4 * P, NLIMBS + 1)]
KP32 = [int(x) for x in _const_limbs(32 * P, NLIMBS + 2)]


def k_pad(xs: List, n: int) -> List:
    """Zero-extend a position list to length n (carry headroom)."""
    if len(xs) >= n:
        return list(xs)
    zero = xs[0] - xs[0]
    return list(xs) + [zero] * (n - len(xs))


def k_carry(xs: List, rounds: int) -> List:
    """Data-parallel carry rounds (value preserving).

    CALLER must ensure the top position's carry-out is statically zero —
    pad with k_pad first when the top position can exceed the radix.
    """
    for _ in range(rounds):
        lo = [x & MASK for x in xs]
        hi = [x >> RADIX_BITS for x in xs]
        xs = [lo[0]] + [lo[i] + hi[i - 1] for i in range(1, len(xs))]
        # top carry hi[-1] is dropped: must be zero by bounds
    return xs


def k_mul_wide(a: Sequence, b: Sequence) -> List:
    """Schoolbook product: two 21-limb lists -> 41 raw positions (< 2^31)."""
    acc: List = [None] * (2 * NLIMBS - 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            t = a[i] * b[j]
            k = i + j
            acc[k] = t if acc[k] is None else acc[k] + t
    return acc


def k_mul_const(a: Sequence, c_limbs: Sequence[int], ncols: int) -> List:
    """a * constant (host int limbs), positions 0..ncols-1 raw."""
    acc: List = [None] * ncols
    for i in range(NLIMBS):
        for j, cj in enumerate(c_limbs):
            if cj == 0 or i + j >= ncols:
                continue
            t = a[i] * cj
            k = i + j
            acc[k] = t if acc[k] is None else acc[k] + t
    zero = a[0] - a[0]
    return [x if x is not None else zero for x in acc]


#: max u = m*p column: 21 terms x m-limb (<= 8213) x p-limb (<= MASK).
_U_COL_BOUND = NLIMBS * 8213 * MASK


def k_mont_reduce(t: List, limb_bound: int = 1 << 15) -> List:
    """Montgomery reduction of a wide accumulator (len <= WIDE).

    Mirrors fields.fp.mont_reduce: m = (t mod R)*N' mod R;
    out = (t + m*p)/R with the {0,R} low-half carry-out dichotomy.
    ``limb_bound`` is the static bound on input positions (drives the
    pre-settle round count); output limbs settled, value < 2p.

    Op-count trims (round 5, both value-preserving):
      * m is mod R by definition, so its raw product needs only NLIMBS
        columns (the carry out of column 20 is dropped — that IS mod R).
      * Only the low NLIMBS+1 positions need pre-settling (they feed m);
        when ``limb_bound + _U_COL_BOUND`` fits int32 the high positions
        stay raw until the s = u + t carry (their carry chain is absorbed
        by the 3 s-rounds, which settle from any < 2^31 column).
        Position NLIMBS's carry-out is explicitly pushed into position
        NLIMBS+1 (k_carry would silently drop it on a slice).
    """
    from ..fields.fp import _rounds_needed

    t = k_pad(t, WIDE)
    rounds = _rounds_needed(limb_bound)
    if rounds:
        # position NLIMBS+1 also absorbs the low part's carry-out
        # (<= limb_bound >> 13 from round 1 plus ~1 per later round)
        if limb_bound + (limb_bound >> RADIX_BITS) + 4 + _U_COL_BOUND < _I31:
            n_lo = NLIMBS + 1
            lo_t = t[:n_lo]
            carry_into = None
            for _ in range(rounds):
                lo = [x & MASK for x in lo_t]
                hi = [x >> RADIX_BITS for x in lo_t]
                lo_t = [lo[0]] + [lo[i] + hi[i - 1] for i in range(1, n_lo)]
                carry_into = (
                    hi[-1] if carry_into is None else carry_into + hi[-1]
                )
            t = lo_t + [t[n_lo] + carry_into] + t[n_lo + 1 :]
        else:
            t = k_carry(t, rounds)
    lo = t[:NLIMBS]
    m_raw = k_mul_const(lo, NP_INT, NLIMBS)
    # two rounds leave m limbs <= 8213 (raw cols <= 21*SETTLED*MASK =
    # 1.41e9; r1 -> 8191 + 172k, r2 -> 8191 + 21 + 1); u's raw columns
    # then stay <= 21*8213*8191 < 2^31 and s settles in the 3 rounds below
    # (r1 -> <= MASK + 2^31>>13, r2 -> <= MASK + 33, r3 -> settled).
    m = k_carry(m_raw, 2)[:NLIMBS]
    u = k_mul_const(m, P_INT, WIDE)
    s = [u[i] + t[i] for i in range(WIDE)]
    s = k_carry(s, 3)
    nz = s[0]
    for i in range(1, NLIMBS):
        nz = nz | s[i]
    carry_out = (nz != 0).astype(jnp.int32)
    out = s[NLIMBS : 2 * NLIMBS]
    out = [out[0] + carry_out] + out[1:]
    return out


def k_mont_mul(a: Sequence, b: Sequence) -> List:
    return k_mont_reduce(
        k_carry(k_pad(k_mul_wide(a, b), WIDE), 1),
        limb_bound=MASK + ((NLIMBS * (RADIX + 1) * (RADIX + 1)) >> RADIX_BITS),
    )


def k_add(a: Sequence, b: Sequence, carry_rounds: int = 1) -> List:
    return k_carry([x + y for x, y in zip(a, b)], carry_rounds)


def k_sub_2p(a: Sequence, b: Sequence) -> List:
    """a - b + 4p for a,b < 2p-ish; signed carries settle in 4 rounds."""
    zero = a[0] - a[0]
    ae = list(a) + [zero]
    be = list(b) + [zero]
    x = [ae[i] - be[i] + KP4[i] for i in range(NLIMBS + 1)]
    return k_carry(x, 4)[:NLIMBS]


def k_neg_2p(a: Sequence) -> List:
    """2p - a for a < 2p."""
    zero = a[0] - a[0]
    ae = list(a) + [zero]
    x = [KP2[i] - ae[i] for i in range(NLIMBS + 1)]
    return k_carry(x, 4)[:NLIMBS]


def k_neg_4p(a: Sequence) -> List:
    """4p - a for a < 4p."""
    zero = a[0] - a[0]
    ae = list(a) + [zero]
    x = [KP4[i] - ae[i] for i in range(NLIMBS + 1)]
    return k_carry(x, 4)[:NLIMBS]


def k_scale(a: Sequence, s: int, rounds: int = 2) -> List:
    return k_carry([x * s for x in a], rounds)


def k_select(mask, a: Sequence, b: Sequence) -> List:
    """mask ? a : b, elementwise over the tile."""
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


# ---------------------------------------------------------------------------
# Bound-tracked kernel values (mirrors fields.fp's static bound discipline)
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _kp_limbs(k: int):
    """k*p as NLIMBS+1 host limbs."""
    return [int(x) for x in _const_limbs(k * P, NLIMBS + 1)]


class KV:
    """In-kernel Fq value: settled limb list + static value bound."""

    __slots__ = ("limbs", "bound")

    def __init__(self, limbs, bound):
        self.limbs = limbs
        self.bound = bound


def kv_add(a: KV, b: KV) -> KV:
    return KV(k_add(a.limbs, b.limbs), a.bound + b.bound)


def kv_sub(a: KV, b: KV) -> KV:
    k = -(-b.bound // P)
    kp = _kp_limbs(k)
    zero = a.limbs[0] - a.limbs[0]
    ae = list(a.limbs) + [zero]
    be = list(b.limbs) + [zero]
    x = [ae[i] - be[i] + kp[i] for i in range(NLIMBS + 1)]
    out = k_carry(x, 5)[:NLIMBS]
    bound = a.bound + k * P
    assert bound < (1 << 271), "kv_sub bound overflow"
    return KV(out, bound)


def kv_neg(a: KV) -> KV:
    k = -(-a.bound // P)
    kp = _kp_limbs(k)
    zero = a.limbs[0] - a.limbs[0]
    ae = list(a.limbs) + [zero]
    x = [kp[i] - ae[i] for i in range(NLIMBS + 1)]
    return KV(k_carry(x, 5)[:NLIMBS], k * P + 1)


def kv_scale(a: KV, s: int) -> KV:
    return KV(k_scale(a.limbs, s, rounds=3), a.bound * s)


_KV_MUL_MAX = 1 << 259


def _kv_prep(a: KV) -> KV:
    if a.bound > _KV_MUL_MAX:
        from ..fields.fp import R_MOD_P as _RMP

        om = [int(x) for x in _const_limbs(_RMP)]
        red = k_mont_reduce(
            k_mul_const(a.limbs, om, WIDE),
            limb_bound=NLIMBS * (MASK + 4) * MASK,
        )
        return KV(red, 2 * P)
    return a


def kv_mul(a: KV, b: KV) -> KV:
    a, b = _kv_prep(a), _kv_prep(b)
    out = k_mont_mul(a.limbs, b.limbs)
    return KV(out, 2 * P)


def kv_select(mask, a: KV, b: KV) -> KV:
    return KV(k_select(mask, a.limbs, b.limbs), max(a.bound, b.bound))


class KV2:
    """In-kernel Fq2 value."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: KV, c1: KV):
        self.c0 = c0
        self.c1 = c1


def kv2_add(a, b):
    return KV2(kv_add(a.c0, b.c0), kv_add(a.c1, b.c1))


def kv2_sub(a, b):
    return KV2(kv_sub(a.c0, b.c0), kv_sub(a.c1, b.c1))


def kv2_neg(a):
    return KV2(kv_neg(a.c0), kv_neg(a.c1))


def kv2_scale(a, s):
    return KV2(kv_scale(a.c0, s), kv_scale(a.c1, s))


def kv2_mul(a, b):
    a0, a1 = _kv_prep(a.c0), _kv_prep(a.c1)
    b0, b1 = _kv_prep(b.c0), _kv_prep(b.c1)
    nb1 = kv_neg(KV(b1.limbs, b1.bound))
    w0 = [
        x + y
        for x, y in zip(
            k_mul_wide_1r(a0.limbs, b0.limbs),
            k_mul_wide_1r(a1.limbs, nb1.limbs),
        )
    ]
    w1 = [
        x + y
        for x, y in zip(
            k_mul_wide_1r(a0.limbs, b1.limbs),
            k_mul_wide_1r(a1.limbs, b0.limbs),
        )
    ]
    return KV2(
        KV(k_mont_reduce(w0, limb_bound=2 * MUL_1R_BOUND), 2 * P),
        KV(k_mont_reduce(w1, limb_bound=2 * MUL_1R_BOUND), 2 * P),
    )


def kv2_square(a):
    a0, a1 = _kv_prep(a.c0), _kv_prep(a.c1)
    t0 = kv_add(KV(a0.limbs, a0.bound), KV(a1.limbs, a1.bound))
    t1 = kv_sub(KV(a0.limbs, a0.bound), KV(a1.limbs, a1.bound))
    t0p, t1p = _kv_prep(t0), _kv_prep(t1)
    c0 = KV(
        k_mont_reduce(
            k_mul_wide_1r(t0p.limbs, t1p.limbs), limb_bound=MUL_1R_BOUND
        ),
        2 * P,
    )
    c1 = KV(
        k_mont_reduce(
            k_mul_wide_1r(k_scale(a0.limbs, 2), a1.limbs),
            limb_bound=MUL_1R_BOUND,
        ),
        2 * P,
    )
    return KV2(c0, c1)


def kv2_select(mask, a, b):
    return KV2(kv_select(mask, a.c0, b.c0), kv_select(mask, a.c1, b.c1))


# ---------------------------------------------------------------------------
# Fq2 helpers: an element is a pair (c0, c1) of limb lists
# ---------------------------------------------------------------------------


def k_mul_wide_carried(a: Sequence, b: Sequence) -> List:
    """Settled WIDE-length product (limbs <= 2^13+1) — safe to accumulate
    up to ~2^17 of these without overflow."""
    return k_carry(k_pad(k_mul_wide(a, b), WIDE), 3)


def k_mul_wide_1r(a: Sequence, b: Sequence) -> List:
    """ONCE-carried WIDE product of settled operands: positions <=
    MASK + (21*SETTLED^2 >> 13) ~ 2^17.5, so up to ~2^13 of these can
    accumulate in int32. Two carry sweeps cheaper than the settled form;
    pass the looser positions to k_mont_reduce via ``limb_bound``."""
    return k_carry(k_pad(k_mul_wide(a, b), WIDE), 1)


#: position bound of a k_mul_wide_1r output (see docstring).
MUL_1R_BOUND = MASK + ((NLIMBS * (RADIX + 1) * (RADIX + 1)) >> RADIX_BITS)


def k2_mul(a, b, bound: int = 4 * P):
    # Karatsuba via the KW signed-wide layer: 3 once-carried products
    # (m0 = a0 b0, m1 = a1 b1, m2 = (a0+a1)(b0+b1)) with c0 = m0 - m1 and
    # c1 = m2 - m0 - m1; kw_finalize adds the mod-p offset and validates
    # the int32/Montgomery budgets exactly. Operands: value < ``bound``
    # (kw_finalize asserts the Montgomery budget at trace time — bounds
    # up to a few hundred p are fine), limbs settled.
    from .kwide import K2, k2w_mul, kw2_finalize

    a2 = K2(list(a[0]), list(a[1]), bound)
    b2 = K2(list(b[0]), list(b[1]), bound)
    return kw2_finalize(k2w_mul(a2, b2))


def k2_square_w(a, bound: int = 4 * P):
    """Fq2 square via the KW layer with an explicit value bound (the
    mod-p subtraction offset scales with ``bound``, unlike k2_square's
    fixed 4p)."""
    from .kwide import K2, k2w_sq, kw2_finalize

    return kw2_finalize(k2w_sq(K2(list(a[0]), list(a[1]), bound)))


def k2_add(a, b):
    return (k_add(a[0], b[0]), k_add(a[1], b[1]))


def k2_sub(a, b):
    return (k_sub_2p(a[0], b[0]), k_sub_2p(a[1], b[1]))


def k2_scale(a, s):
    return (k_scale(a[0], s), k_scale(a[1], s))


def k2_square(a):
    """(a0+a1u)^2 = ((a0+a1)(a0-a1), 2 a0 a1); 2 wide muls, 2 reductions."""
    a0, a1 = a
    t0 = k_add(a0, a1)
    t1 = k_sub_2p(a0, a1)
    c0 = k_mont_reduce(k_mul_wide_1r(t0, t1), limb_bound=MUL_1R_BOUND)
    c1 = k_mont_reduce(
        k_mul_wide_1r(k_scale(a0, 2), a1), limb_bound=MUL_1R_BOUND
    )
    return (c0, c1)


def k_cyc_sq(slots):
    """Granger-Scott cyclotomic squaring on 6 Fq2 slots (see
    fields.fp12.fq12_cyclotomic_sq). Input slots (2p, settled); output
    same envelope.

    The whole formula — fq4 squarings AND the 3A ± 2a linear combination —
    stays in the KW signed-wide domain, so each output component pays
    exactly ONE Montgomery reduction (the old form finalized the fq4
    parts and then renormalized the linear combination with a second
    mul-by-one reduce per component: 24 reduces; this does 12). The
    linear ±2a term enters the wide domain as a const-multiply by
    2R mod p — the reduce's R^-1 then returns it to plain Montgomery
    form, matching the product terms."""
    from . import kwide as W
    from ..utils.bn254 import P as _P
    from ..fields.fp import R_MOD_P as _RMP

    S = [W.K2(list(s[0]), list(s[1]), 2 * _P) for s in slots]

    two_r = (2 * _RMP) % _P
    two_r_limbs = [int(x) for x in _const_limbs(two_r)]
    # exact per-position bounds of the const-mul wide
    pb_2r = tuple(
        SETTLED
        * sum(
            two_r_limbs[j]
            for j in range(max(0, k - NLIMBS + 1), min(k + 1, NLIMBS))
        )
        for k in range(WIDE)
    )

    def lift2(s: W.K2):
        """Settled Fq2 operand as a KWPair holding 2*R*value (so one
        Montgomery reduce returns 2*value)."""

        def lift(limbs):
            w = k_mul_const(limbs, two_r_limbs, WIDE)
            return W.KW(list(w), pb_2r, (0,) * WIDE, s.bound * two_r, 0)

        return (lift(s.c0), lift(s.c1))

    def fq4_sq_w(x: W.K2, y: W.K2):
        x2 = W.k2w_sq(x)
        y2 = W.k2w_sq(y)
        sq = W.k2w_sq(W.k2_sum(x, y))
        cross = W.kw2_sub(W.kw2_sub(sq, x2), y2)  # = 2xy in Fq4
        return W.kw2_add(x2, W.kw2_xi(y2)), cross

    A0, A1 = fq4_sq_w(S[0], S[3])
    B0, B1 = fq4_sq_w(S[1], S[4])
    C0, C1 = fq4_sq_w(S[2], S[5])

    def scale2(x, s):
        return (W.kw_scale(x[0], s), W.kw_scale(x[1], s))

    out = [None] * 6
    out[0] = W.kw2_sub(scale2(A0, 3), lift2(S[0]))
    out[2] = W.kw2_sub(scale2(B0, 3), lift2(S[2]))
    out[4] = W.kw2_sub(scale2(C0, 3), lift2(S[4]))
    out[1] = W.kw2_add(scale2(W.kw2_xi(C1), 3), lift2(S[1]))
    out[3] = W.kw2_add(scale2(A1, 3), lift2(S[3]))
    out[5] = W.kw2_add(scale2(B1, 3), lift2(S[5]))
    return [W.kw2_finalize(c) for c in out]


def k2_mul_w6(a):
    """xi * a = (9 c0 - c1, c0 + 9 c1); inputs < 2p -> outputs < 20p.

    Output limbs settled; value bound ~20p still safe for products
    (20p * 4p * 24 < 16 R p)."""
    c0, c1 = a
    zero = c0[0] - c0[0]
    t0 = [c0[i] * 9 for i in range(NLIMBS)] + [zero]
    s0 = [t0[i] - (c1[i] if i < NLIMBS else 0) + KP2[i] for i in range(NLIMBS + 1)]
    s0 = k_carry(s0, 4)[:NLIMBS]
    s1 = k_carry([c0[i] + c1[i] * 9 for i in range(NLIMBS)], 2)
    return (s0, s1)
