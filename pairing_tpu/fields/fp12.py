"""Vectorized Fq12 in the halo2-lib coefficient basis.

An element is ``sum_{i=0..5} (c_i + c_{i+6} u) w^i`` with ``w^6 = xi = 9+u``,
stored as 6 :class:`Fp2` slots (SURVEY.md §2.2, miller_loop_native.rs:46-96).
This mirrors the reference's ``MyFq12``/``Fq12Target`` layer (C8/C10) so the
TPU kernels are limb-for-limb comparable with reference vectors.

Multiplication strategy (TPU-first): every (sparse or dense) Fq12 product is
compiled — statically, per sparsity pattern — into ONE gathered limb-product
over a stacked term tensor ``[T, ..., NLIMBS]`` followed by a segment-sum
into the 12 output coefficients and a single stacked Montgomery reduction.
The xi-fold of high powers (w^6..w^10 -> w^0..w^4, miller_loop_native.rs:71-79)
is absorbed by pre-multiplying the relevant LHS slots with xi, which keeps
the whole accumulation additive (no signed wides). 144 limb-products but
only 12 Montgomery reductions per dense multiply.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bn254 import P, frob_coeff_pow
from . import fp as F
from . import fp2 as F2
from .fp import Fp, WideAcc
from .fp2 import Fp2

#: Sparse slot patterns of the two line shapes (SURVEY.md §2.2).
LINE_EQUAL_SLOTS = (0, 3, 4)  # tangent "034"
LINE_UNEQUAL_SLOTS = (2, 3, 5)  # chord "235"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Fq12:
    """6 Fp2 slots, coefficient basis."""

    s: Tuple[Fp2, ...]

    def tree_flatten(self):
        return tuple(self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children))

    @property
    def batch_shape(self):
        return self.s[0].batch_shape


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------


def fq12_one(batch_shape: Tuple[int, ...] = ()) -> Fq12:
    slots = [F2.one_mont(batch_shape)] + [F2.zero(batch_shape) for _ in range(5)]
    return Fq12(tuple(slots))


def fq12_from_int_coeffs(coeffs_batch: Sequence[Sequence[int]]) -> Fq12:
    """[[12 ints], ...] (reference MyFq12.coeffs layout) -> Fq12 batch."""
    arr = np.asarray(coeffs_batch, dtype=object)
    assert arr.shape[-1] == 12
    slots = []
    for i in range(6):
        slots.append(
            F2.fp2_stack_from_ints(
                [(row[i], row[i + 6]) for row in coeffs_batch], mont=True
            )
        )
    return Fq12(tuple(slots))


def fq12_to_int_coeffs(a: Fq12):
    """Fq12 batch -> list of 12-int coefficient lists (canonical, non-mont)."""
    per_slot = [F2.fp2_to_ints(s, mont=True) for s in a.s]
    n = len(per_slot[0])
    out = []
    for b in range(n):
        c = [int(per_slot[i][b][0]) for i in range(6)] + [
            int(per_slot[i][b][1]) for i in range(6)
        ]
        out.append(c)
    return out


def fq12_to_canonical_limbs(a: Fq12) -> jnp.ndarray:
    """Device-side canonical export: int32 ``[*batch, 12, NLIMBS]``.

    Row ``i`` (``i+6``) is the canonical (fully reduced, non-Montgomery)
    13-bit limb vector of slot ``i``'s c0 (c1) — the same coefficient
    order as :func:`fq12_to_int_coeffs`. All reduction happens on device,
    so exporting a huge streamed run costs one bulk int32 fetch instead
    of per-element Python bigint conversion.
    """
    comps = [F.canonical(F.from_mont(a.s[i].c0)).limbs for i in range(6)]
    comps += [F.canonical(F.from_mont(a.s[i].c1)).limbs for i in range(6)]
    return jnp.stack(comps, axis=-2)


def fq12_limbs_to_int_coeffs(arr):
    """Host helper: canonical limb array ``[*batch, 12, NLIMBS]`` (see
    :func:`fq12_to_canonical_limbs`) -> list of 12-int coefficient lists.

    Uses the native C codec (pairing_tpu.native) when available — packs
    each canonical row to 32 bytes in C and converts with
    ``int.from_bytes`` (measured ~4x the numpy object-array path:
    1.5M rows/s vs 0.36M). Both backends reduce mod p, so redundant
    (out-of-contract) limb rows yield identical residues either way."""
    from .. import native
    from ..utils.bn254 import P as _P

    a = np.asarray(arr)
    if native.available():
        flat = native.ints_from_limbs(a.reshape(-1, F.NLIMBS))
        return [flat[12 * i : 12 * (i + 1)] for i in range(len(flat) // 12)]
    a = a.astype(object)
    weights = np.array(
        [1 << (F.RADIX_BITS * i) for i in range(F.NLIMBS)], dtype=object
    )
    vals = (a * weights).sum(axis=-1) % _P
    return [list(row) for row in vals.reshape(-1, 12)]


def fq12_from_sparse(slots: Dict[int, Fp2], batch_shape) -> Fq12:
    """Embed sparse Fq2 slots (e.g. a line function) into a full Fq12."""
    full = []
    for i in range(6):
        full.append(slots[i] if i in slots else F2.zero(batch_shape))
    return Fq12(tuple(full))


# ---------------------------------------------------------------------------
# Cheap coefficient-wise ops
# ---------------------------------------------------------------------------


def conjugate(a: Fq12) -> Fq12:
    """Negate odd powers of w (final_exp_native.rs:171-181); equals the
    q^6-Frobenius, and the inverse on the cyclotomic unit subgroup."""
    out = []
    for i, s in enumerate(a.s):
        out.append(s if i % 2 == 0 else F2.neg(s))
    return Fq12(tuple(out))


def fq12_select(mask, a: Fq12, b: Fq12) -> Fq12:
    return Fq12(tuple(F2.select(mask, x, y) for x, y in zip(a.s, b.s)))


def fq12_eq(a: Fq12, b: Fq12):
    out = None
    for x, y in zip(a.s, b.s):
        e = F2.eq(x, y)
        out = e if out is None else jnp.logical_and(out, e)
    return out


# ---------------------------------------------------------------------------
# The gathered multiply
# ---------------------------------------------------------------------------

# LHS vocabulary rows (per slot i): 4 entries
#   4*i + 0: a.c0[i]      4*i + 1: a.c1[i]
#   4*i + 2: (xi*a).c0[i] 4*i + 3: (xi*a).c1[i]
# RHS vocabulary rows (per present slot j, built densely over the pattern):
#   3*jj + 0: b.c0[j]     3*jj + 1: b.c1[j]    3*jj + 2: -b.c1[j]


@lru_cache(maxsize=None)
def _term_table(present: Tuple[int, ...]):
    """Static term list for multiplying by an operand with ``present`` slots.

    Returns (lhs_idx, rhs_idx, seg, n_pairs_per_seg) as numpy arrays; seg is
    2*out_slot + component.
    """
    lhs_idx, rhs_idx, seg = [], [], []
    terms_per_seg = np.zeros((12,), dtype=np.int64)
    for i in range(6):
        for jj, j in enumerate(present):
            k = i + j
            hi = k >= 6
            out_slot = k - 6 if hi else k
            base = 4 * i + (2 if hi else 0)
            # c0 component: a.c0*b.c0 + a.c1*(-b.c1)
            lhs_idx += [base + 0, base + 1]
            rhs_idx += [3 * jj + 0, 3 * jj + 2]
            seg += [2 * out_slot + 0] * 2
            # c1 component: a.c0*b.c1 + a.c1*b.c0
            lhs_idx += [base + 0, base + 1]
            rhs_idx += [3 * jj + 1, 3 * jj + 0]
            seg += [2 * out_slot + 1] * 2
            terms_per_seg[2 * out_slot + 0] += 2
            terms_per_seg[2 * out_slot + 1] += 2
    return (
        np.asarray(lhs_idx, dtype=np.int32),
        np.asarray(rhs_idx, dtype=np.int32),
        np.asarray(seg, dtype=np.int32),
        terms_per_seg,
    )


_PREP_BOUND = 1 << 257


def _prep(x: Fp) -> Fp:
    if x.limb_bound > F.SETTLED:
        x = Fp(F.quasi_carry(x.limbs, x.limb_bound), x.bound, F.SETTLED)
    if x.bound > _PREP_BOUND:
        x = F.weak_reduce(x)
    return x


def _mul_gathered(a: Fq12, b_slots: Dict[int, Fp2]) -> Fq12:
    present = tuple(sorted(b_slots.keys()))
    lhs_idx, rhs_idx, seg, terms_per_seg = _term_table(present)

    # LHS vocabulary: slots and xi-premultiplied slots
    lhs_vocab: list = []
    for i in range(6):
        axi = F2.mul_w6(a.s[i])
        lhs_vocab += [a.s[i].c0, a.s[i].c1, axi.c0, axi.c1]
    lhs_vocab = [_prep(x) for x in lhs_vocab]

    rhs_vocab: list = []
    for j in present:
        bj = b_slots[j]
        rhs_vocab += [bj.c0, bj.c1, F.fp_neg(bj.c1)]
    rhs_vocab = [_prep(x) for x in rhs_vocab]

    lhs_bounds = [x.bound for x in lhs_vocab]
    rhs_bounds = [x.bound for x in rhs_vocab]
    seg_val_bound = np.zeros((12,), dtype=object)
    for li, ri, s in zip(lhs_idx, rhs_idx, seg):
        seg_val_bound[s] += lhs_bounds[li] * rhs_bounds[ri]
    max_val_bound = int(max(int(v) for v in seg_val_bound))
    assert max_val_bound <= F.R_MONT * P * 16, "fq12 accumulation overflow"

    lhs_arr = jnp.stack([x.limbs for x in lhs_vocab])  # [24, ..., L]
    rhs_arr = jnp.stack([x.limbs for x in rhs_vocab])  # [3p, ..., L]
    lhs = lhs_arr[jnp.asarray(lhs_idx)]  # [T, ..., L]
    rhs = rhs_arr[jnp.asarray(rhs_idx)]

    raw = F._mul_wide_raw(lhs, rhs, F.WIDE_NLIMBS)
    carried = F.quasi_carry(raw, F.NLIMBS * F.SETTLED * F.SETTLED)
    acc = jax.ops.segment_sum(carried, jnp.asarray(seg), num_segments=12)

    max_terms = int(terms_per_seg.max())
    wide = WideAcc(acc, val_bound=max_val_bound, limb_bound=max_terms * F.SETTLED)
    out = F.mont_reduce(wide)  # stacked [12, ..., L]

    slots = []
    for i in range(6):
        c0 = Fp(out.limbs[2 * i + 0], out.bound, out.limb_bound)
        c1 = Fp(out.limbs[2 * i + 1], out.bound, out.limb_bound)
        slots.append(Fp2(c0, c1))
    return Fq12(tuple(slots))


def fq12_mul(a: Fq12, b: Fq12) -> Fq12:
    """Dense product; 144 limb-products, 12 Montgomery reductions."""
    return _mul_gathered(a, {i: b.s[i] for i in range(6)})


def fq12_sq(a: Fq12) -> Fq12:
    return fq12_mul(a, a)


def fq12_mul_sparse(a: Fq12, slots: Dict[int, Fp2]) -> Fq12:
    """sparse_fp12_multiply (miller_loop_native.rs:46-96): multiply by a
    034/235-shaped line without materializing the zero slots."""
    return _mul_gathered(a, slots)


def fq12_cyclotomic_sq(a: Fq12) -> Fq12:
    """Granger-Scott squaring for unit-norm elements (~8x cheaper than a
    dense square). Valid exactly on the cyclotomic subgroup (post
    easy-part); value-identical to fq12_sq there. Uses the Fq4
    decomposition g_i = slot_i + slot_{i+3} w^3, (w^3)^2 = xi."""
    s = a.s

    def fq4_sq(x: Fp2, y: Fp2):
        x2 = F2.square(x)
        y2 = F2.square(y)
        cross = F2.sub(F2.square(F2.add(x, y)), F2.add(x2, y2))
        return F2.add(x2, F2.mul_w6(y2)), cross

    A0, A1 = fq4_sq(s[0], s[3])
    B0, B1 = fq4_sq(s[1], s[4])
    C0, C1 = fq4_sq(s[2], s[5])
    out = [None] * 6
    out[0] = F2.sub(F2.scale(A0, 3), F2.scale(s[0], 2))
    out[2] = F2.sub(F2.scale(B0, 3), F2.scale(s[2], 2))
    out[4] = F2.sub(F2.scale(C0, 3), F2.scale(s[4], 2))
    out[1] = F2.add(F2.scale(F2.mul_w6(C1), 3), F2.scale(s[1], 2))
    out[3] = F2.add(F2.scale(A1, 3), F2.scale(s[3], 2))
    out[5] = F2.add(F2.scale(B1, 3), F2.scale(s[5], 2))
    return Fq12(tuple(F2.cap(x) for x in out))


# ---------------------------------------------------------------------------
# Frobenius
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _frob_const(power: int, i: int):
    return frob_coeff_pow(power, i)


def frobenius_map(a: Fq12, power: int) -> Fq12:
    """final_exp_native.rs:17-54: conjugate slots (odd powers) then multiply
    slot i by the constant frob_coeffs(power)^i."""
    pw = power % 12
    out = []
    for i in range(6):
        s = a.s[i]
        if pw % 2 != 0:
            s = F2.conj(s)
        g0, g1 = _frob_const(pw, i)
        if (g0, g1) == (1, 0):
            out.append(s)
        else:
            const = F2.fp2_from_ints((g0, g1), mont=True)
            out.append(F2.mul(s, const))
    return Fq12(tuple(out))


# ---------------------------------------------------------------------------
# Inversion (via the internal tower Fq12 = Fq6[w]/(w^2 - v), v = w^2)
# ---------------------------------------------------------------------------


def _fq6_mul(x, y):
    # Fq6 = Fq2[v]/(v^3 - xi); x, y are 3-tuples of Fp2
    m = F2.mul
    c0 = F2.add(m(x[0], y[0]), F2.mul_w6(F2.add(m(x[1], y[2]), m(x[2], y[1]))))
    c1 = F2.add(F2.add(m(x[0], y[1]), m(x[1], y[0])), F2.mul_w6(m(x[2], y[2])))
    c2 = F2.add(F2.add(m(x[0], y[2]), m(x[2], y[0])), m(x[1], y[1]))
    return (c0, c1, c2)


def _fq6_inv(x):
    m, s = F2.mul, F2.square
    c0, c1, c2 = x
    t0 = F2.sub(s(c0), F2.mul_w6(m(c1, c2)))
    t1 = F2.sub(F2.mul_w6(s(c2)), m(c0, c1))
    t2 = F2.sub(s(c1), m(c0, c2))
    norm = F2.add(m(c0, t0), F2.mul_w6(F2.add(m(c1, t2), m(c2, t1))))
    ninv = F2.inv(norm)
    return (m(t0, ninv), m(t1, ninv), m(t2, ninv))


def fq12_inv(a: Fq12) -> Fq12:
    """(A + Bw)^{-1} = (A - Bw) / (A^2 - B^2 v); unique, so value-identical
    to the reference's arkworks division (final_exp_native.rs:72-75)."""
    A = (a.s[0], a.s[2], a.s[4])
    B = (a.s[1], a.s[3], a.s[5])
    b2 = _fq6_mul(B, B)
    b2v = (F2.mul_w6(b2[2]), b2[0], b2[1])  # multiply by v (v^3 = xi)
    denom = tuple(F2.sub(x, y) for x, y in zip(_fq6_mul(A, A), b2v))
    dinv = _fq6_inv(denom)
    out_a = _fq6_mul(A, dinv)
    out_b = _fq6_mul(tuple(F2.neg(x) for x in B), dinv)
    return Fq12((out_a[0], out_b[0], out_a[1], out_b[1], out_a[2], out_b[2]))


def fq12_div(a: Fq12, b: Fq12) -> Fq12:
    return fq12_mul(a, fq12_inv(b))
