"""Signed wide accumulators with exact static bound tracking.

The v2 Fq12 product cores (unordered-pair + Fq2-Karatsuba decomposition,
see ops/fq12_kernels) need *subtraction* of Montgomery product wides:

    c1 = (a0+a1)(b0+b1) - a0*b0 - a1*b1          (Fq2 Karatsuba)
    2*Ai*Aj = (Ai+Aj)^2 - Ai^2 - Aj^2            (unordered-pair square)

On int32 tiles this is safe because add/sub/mul wrap mod 2^32
value-preservingly; only carry *shifts* need true in-range values.  So a
``KW`` accumulates raw (uncarried) position sums with exact Python-int
bounds, and a single host-constant offset ``C`` (value ``== 0 mod p``) is
added at finalize time to make every position non-negative before the
final carry + Montgomery reduce.

Bound facts used (all asserted exactly, nothing estimated):

  * A carried non-negative product wide of value <= V has positions
    ``pos_i <= min(SETTLED, V >> 13*i)`` (positions stay non-negative
    through the carry rounds and sum to the value), so the taper keeps
    ``value(C)`` within ~2x of the negated terms' value bounds instead of
    the 2^573 a flat 44-position offset would cost.
  * The Montgomery reduce of ``fields.fp`` accepts any non-negative wide
    with value < R*p (R = 2^273), giving ~2^19*p^2 of headroom over the
    64*p^2-scale products here — enough for every v2 core's worst slot
    (asserted per accumulator at trace time).

Everything here runs inside Pallas kernel bodies (plain jnp ops on
[8,128] tiles); the bound arithmetic happens at trace time on Python ints.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

from ..fields.fp import MASK, NLIMBS, RADIX_BITS, SETTLED, _const_limbs
from ..utils.bn254 import P
from . import kernel_core as K

WIDE = K.WIDE  # 44
_RP = (1 << (RADIX_BITS * NLIMBS)) * P  # Montgomery reduce input ceiling
_I32 = (1 << 31) - 1


def _taper(v: int) -> Tuple[int, ...]:
    """Per-position bounds of a carried non-negative wide of value <= v."""
    return tuple(min(SETTLED, v >> (RADIX_BITS * i)) for i in range(WIDE))


@lru_cache(maxsize=None)
def _prod_pb_1r(la: int, lb: int, vv: int) -> Tuple[int, ...]:
    """Exact per-position bounds of a ONCE-carried product wide.

    Raw schoolbook column k of a product (limbs <= la, lb; value <= vv)
    holds min(k+1, NLIMBS, 2*NLIMBS-1-k) terms, each <= la*lb; since all
    positions are non-negative and weight-sum to the value, column k is
    also <= vv >> 13k (the value taper that keeps kw_finalize's mod-p
    offset within the Montgomery budget). One carry round maps bounds
    b[k] -> min(MASK, b[k]) + (b[k-1] >> 13), still value-tapered.
    """
    raw = []
    for k in range(WIDE):
        if k <= 2 * NLIMBS - 2:
            ck = min(k + 1, NLIMBS, 2 * NLIMBS - 1 - k)
            raw.append(min(ck * la * lb, vv >> (RADIX_BITS * k)))
        else:
            raw.append(0)
    pb = [min(MASK, raw[0])]
    for k in range(1, WIDE):
        pb.append(
            min(
                min(MASK, raw[k]) + (raw[k - 1] >> RADIX_BITS),
                vv >> (RADIX_BITS * k),
            )
        )
    return tuple(pb)


class KW:
    """Signed wide accumulator: raw int32 positions + exact static bounds.

    pos:  WIDE tiles (never carried until finalize)
    pb:   per-position max (>= 0)
    nb:   per-position max negative magnitude (>= 0)
    vhi:  exact value upper bound
    vneg: exact value lower-bound magnitude (value >= -vneg)
    """

    __slots__ = ("pos", "pb", "nb", "vhi", "vneg")

    def __init__(self, pos, pb, nb, vhi, vneg):
        self.pos = pos
        self.pb = tuple(pb)
        self.nb = tuple(nb)
        self.vhi = vhi
        self.vneg = vneg
        for p, n in zip(self.pb, self.nb):
            assert p <= _I32 and n <= _I32, "KW position magnitude overflow"


_KSPLIT = (NLIMBS + 1) // 2  # 11 low limbs, 10 high limbs


def _school(xs: Sequence, ys: Sequence) -> List:
    """Trace-time schoolbook column sums (len(xs)+len(ys)-1 positions)."""
    acc: List = [None] * (len(xs) + len(ys) - 1)
    for i, x in enumerate(xs):
        for j, y in enumerate(ys):
            t = x * y
            k = i + j
            acc[k] = t if acc[k] is None else acc[k] + t
    return acc


def _colb(n1: int, n2: int, k: int, per: int) -> int:
    """Max magnitude of schoolbook column k (term count x per-term max)."""
    if k < 0 or k > n1 + n2 - 2:
        return 0
    return min(k + 1, n1, n2, n1 + n2 - 1 - k) * per


@lru_cache(maxsize=None)
def _kara_bounds(la: int, lb: int, va: int, vb: int):
    """Exact raw/carried bounds of the split-limb Karatsuba product wide.

    Returns (ok, pb_carried, nb_carried): ok=False when a raw column
    would overflow int32 (caller falls back to schoolbook). Bound model:

      m0 = a_lo*b_lo, m1 = a_hi*b_hi (non-negative, value-tapered: a
      non-negative schoolbook's column k satisfies col*2^13k <= value),
      md = (a_lo-a_hi)(b_lo-b_hi) with |md[k]| <= colb(k)*la*lb (no
      taper: differences can cancel in value but not per-limb),
      out[k] = m0[k] + (m0+m1-md)[k-11] + m1[k-22].
    """
    ns_lo, ns_hi = _KSPLIT, NLIMBS - _KSPLIT
    lo_cap = (1 << (RADIX_BITS * ns_lo)) - 1
    hi_cap = (1 << (RADIX_BITS * ns_hi)) - 1
    av_lo = min(va, la * lo_cap // MASK + 1)
    bv_lo = min(vb, lb * lo_cap // MASK + 1)
    av_hi = min(va >> (RADIX_BITS * ns_lo), la * hi_cap // MASK + 1)
    bv_hi = min(vb >> (RADIX_BITS * ns_lo), lb * hi_cap // MASK + 1)
    m0v = av_lo * bv_lo
    m1v = av_hi * bv_hi

    def pb0(k):
        if k < 0:
            return 0
        return min(_colb(ns_lo, ns_lo, k, la * lb), m0v >> (RADIX_BITS * k))

    def pb1(k):
        if k < 0:
            return 0
        return min(_colb(ns_hi, ns_hi, k, la * lb), m1v >> (RADIX_BITS * k))

    def mdb(k):
        return _colb(ns_lo, ns_lo, k, la * lb)

    raw_pb, raw_nb = [], []
    for k in range(WIDE):
        mid = k - ns_lo
        raw_pb.append(pb0(k) + pb0(mid) + pb1(mid) + pb1(k - 2 * ns_lo))
        raw_nb.append(mdb(mid))
    if max(raw_pb) > _I32 or max(raw_nb) > _I32:
        return False, None, None
    # One signed carry round: pos'[k] = (raw[k] & MASK) + (raw[k-1] >> 13).
    # The lo part is in [0, MASK] (two's complement & for negatives too);
    # when the position is provably non-negative it is <= raw_pb[k]. The
    # hi part is in [-ceil(nb/2^13), pb >> 13] (arithmetic shift).
    pb, nb = [], []
    for k in range(WIDE):
        lo_hi = min(MASK, raw_pb[k]) if raw_nb[k] == 0 else MASK
        hi_pos = raw_pb[k - 1] >> RADIX_BITS if k else 0
        hi_neg = (raw_nb[k - 1] + MASK) >> RADIX_BITS if k else 0
        pb.append(lo_hi + hi_pos)
        nb.append(hi_neg)
    return True, tuple(pb), tuple(nb)


def kw_prod(a: Sequence, b: Sequence, va: int, vb: int,
            la: int = SETTLED, lb: int = SETTLED) -> KW:
    """Product wide of settled operands (values <= va, vb; limbs <= la,
    lb), carried ONCE so ~2^13 of them can accumulate in int32.

    Uses split-limb subtractive Karatsuba (11/10 split: 342 MACs instead
    of 441) when the signed middle columns provably fit int32 (exact
    per-position bounds via :func:`_kara_bounds`; worst column is
    31*la*lb), falling back to the plain schoolbook otherwise. Both
    variants return exact per-position bounds for the KW budget checks.
    """
    v = va * vb
    ok, pb, nb = _kara_bounds(la, lb, va, vb)
    if ok:
        ns_lo = _KSPLIT
        a_lo, a_hi = list(a[:ns_lo]), list(a[ns_lo:])
        b_lo, b_hi = list(b[:ns_lo]), list(b[ns_lo:])
        m0 = _school(a_lo, b_lo)
        m1 = _school(a_hi, b_hi)
        da = [
            a_lo[i] - a_hi[i] if i < len(a_hi) else a_lo[i]
            for i in range(ns_lo)
        ]
        db = [
            b_lo[i] - b_hi[i] if i < len(b_hi) else b_lo[i]
            for i in range(ns_lo)
        ]
        md = _school(da, db)
        mid = [
            (m0[k] if k < len(m0) else 0)
            + (m1[k] if k < len(m1) else 0)
            - md[k]
            for k in range(len(md))
        ]
        out: List = [None] * WIDE
        for k, x in enumerate(m0):
            out[k] = x
        for k, x in enumerate(mid):
            p = ns_lo + k
            out[p] = x if out[p] is None else out[p] + x
        for k, x in enumerate(m1):
            p = 2 * ns_lo + k
            out[p] = x if out[p] is None else out[p] + x
        zero = a[0] - a[0]
        out = [x if x is not None else zero for x in out]
        w = K.k_carry(out, 1)
        return KW(list(w), pb, nb, v, 0)
    assert NLIMBS * la * lb <= _I32, "kw_prod operand limbs too large"
    w = K.k_carry(K.k_pad(K.k_mul_wide(a, b), WIDE), 1)
    return KW(list(w), _prod_pb_1r(la, lb, v), (0,) * WIDE, v, 0)


def kw_add(x: KW, y: KW) -> KW:
    return KW(
        [a + b for a, b in zip(x.pos, y.pos)],
        [a + b for a, b in zip(x.pb, y.pb)],
        [a + b for a, b in zip(x.nb, y.nb)],
        x.vhi + y.vhi,
        x.vneg + y.vneg,
    )


def kw_sub(x: KW, y: KW) -> KW:
    return KW(
        [a - b for a, b in zip(x.pos, y.pos)],
        [a + b for a, b in zip(x.pb, y.nb)],
        [a + b for a, b in zip(x.nb, y.pb)],
        x.vhi + y.vneg,
        x.vneg + y.vhi,
    )


def kw_neg(x: KW) -> KW:
    """-x: positions negate, positive/negative bounds swap (exact)."""
    return KW(
        [-p for p in x.pos],
        x.nb,
        x.pb,
        x.vneg,
        x.vhi,
    )


def kw_scale(x: KW, s: int) -> KW:
    assert s > 0
    return KW(
        [p * s for p in x.pos],
        [b * s for b in x.pb],
        [b * s for b in x.nb],
        x.vhi * s,
        x.vneg * s,
    )


KWPair = Tuple[KW, KW]  # an Fq2 value as two wide accumulators


def kw2_add(x: KWPair, y: KWPair) -> KWPair:
    return (kw_add(x[0], y[0]), kw_add(x[1], y[1]))


def kw2_sub(x: KWPair, y: KWPair) -> KWPair:
    return (kw_sub(x[0], y[0]), kw_sub(x[1], y[1]))


def kw2_neg(x: KWPair) -> KWPair:
    return (kw_neg(x[0]), kw_neg(x[1]))


def kw2_xi(x: KWPair) -> KWPair:
    """xi * (c0 + c1 u) = (9 c0 - c1) + (c0 + 9 c1) u   (fp2.mul_w6)."""
    return (kw_sub(kw_scale(x[0], 9), x[1]), kw_add(x[0], kw_scale(x[1], 9)))


@lru_cache(maxsize=None)
def _offset_limbs(nb: Tuple[int, ...]) -> Tuple[Tuple[int, ...], int]:
    """Host offset C >= nb per position with value == 0 mod p.

    Returns (positions, value). Built as the nb vector plus the limbs of
    ``p - (value(nb) mod p)`` folded into the low positions.
    """
    c = list(nb)
    v = sum(x << (RADIX_BITS * i) for i, x in enumerate(c))
    pad = (-v) % P
    if pad:
        for i, l in enumerate(_const_limbs(pad, NLIMBS)):
            c[i] += int(l)
    v = sum(x << (RADIX_BITS * i) for i, x in enumerate(c))
    assert v % P == 0
    return tuple(c), v


def kw_finalize(x: KW) -> List:
    """Make positions non-negative (add the mod-p offset), validate the
    Montgomery budget, and reduce to a settled limb list < 2p."""
    c, cv = _offset_limbs(x.nb)
    total = x.vhi + cv
    # 0.99*R*p, not R*p: k_mont_reduce's 2-round m can slightly exceed R
    # in value (limbs <= 8213), so out < total/R + (m/R)*p needs total a
    # hair below R*p to preserve the < 2p output envelope.
    assert total * 100 < _RP * 99, (
        f"KW value budget exceeded: {total.bit_length()} bits vs "
        f"{_RP.bit_length()} (R*p)"
    )
    out = [p + ci if ci else p for p, ci in zip(x.pos, c)]
    limb_bound = max(pb + ci for pb, ci in zip(x.pb, c))
    assert limb_bound <= _I32
    return K.k_mont_reduce(out, limb_bound=limb_bound)


def kw2_finalize(x: KWPair) -> Tuple[List, List]:
    return kw_finalize(x[0]), kw_finalize(x[1])


# ---------------------------------------------------------------------------
# Fq2 products as wide pairs (Karatsuba: 3 muls; squaring: 2 muls)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _kp_limbs(k: int) -> Tuple[int, ...]:
    return tuple(int(x) for x in _const_limbs(k * P, NLIMBS + 1))


def _sum_settled(a: Sequence, b: Sequence) -> List:
    """a + b with one carry round (limbs back <= SETTLED)."""
    return K.k_carry([x + y for x, y in zip(a, b)], 1)


def _diff_settled(a: Sequence, b: Sequence, vb: int) -> Tuple[List, int]:
    """a - b + kp (non-negative, settled); returns (limbs, k*P)."""
    k = -(-vb // P)
    kp = _kp_limbs(k)
    zero = a[0] - a[0]
    ae = list(a) + [zero]
    be = list(b) + [zero]
    x = [ae[i] - be[i] + kp[i] for i in range(NLIMBS + 1)]
    return K.k_carry(x, 4)[:NLIMBS], k * P


class K2:
    """Settled in-kernel Fq2 operand: two limb lists + one value bound."""

    __slots__ = ("c0", "c1", "bound")

    def __init__(self, c0, c1, bound: int):
        self.c0 = c0
        self.c1 = c1
        self.bound = bound


def k2_sum(a: K2, b: K2) -> K2:
    return K2(_sum_settled(a.c0, b.c0), _sum_settled(a.c1, b.c1),
              a.bound + b.bound)


def k2w_mul(a: K2, b: K2) -> KWPair:
    """(a0 + a1 u)(b0 + b1 u) as wide pair — 3 wide muls (Karatsuba).

    c0 = m0 - m1,  c1 = m2 - m0 - m1  with m2 = (a0+a1)(b0+b1).
    """
    sa = _sum_settled(a.c0, a.c1)
    sb = _sum_settled(b.c0, b.c1)
    m0 = kw_prod(a.c0, b.c0, a.bound, b.bound)
    m1 = kw_prod(a.c1, b.c1, a.bound, b.bound)
    m2 = kw_prod(sa, sb, 2 * a.bound, 2 * b.bound)
    return (kw_sub(m0, m1), kw_sub(kw_sub(m2, m0), m1))


def k2w_sq(a: K2) -> KWPair:
    """(a0 + a1 u)^2 as wide pair — 2 wide muls.

    c0 = (a0+a1)(a0 - a1 + kp)  (the kp offset keeps the operand
    non-negative; kp*(a0+a1) == 0 mod p), c1 = 2 a0 a1.
    """
    sa = _sum_settled(a.c0, a.c1)
    da, kp = _diff_settled(a.c0, a.c1, a.bound)
    c0 = kw_prod(sa, da, 2 * a.bound, a.bound + kp)
    c1 = kw_scale(kw_prod(a.c0, a.c1, a.bound, a.bound), 2)
    return (c0, c1)
