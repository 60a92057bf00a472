"""KW signed-wide accumulator layer vs exact integer arithmetic.

These ops run on plain int32 arrays (no Pallas needed): each test drives
the same tile code the kernels trace, against Python-int ground truth.
Semantics: operands are raw limb values v; a product wide finalizes to
``(va * vb) * R^{-1} mod p`` (Montgomery), as a settled limb list < 2p.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pairing_tpu.fields.fp import MASK, NLIMBS, RADIX_BITS
from pairing_tpu.utils.bn254 import P
from pairing_tpu.ops import kwide as W
from pairing_tpu.ops import kernel_core as K

R = 1 << (RADIX_BITS * NLIMBS)
RINV = pow(R, -1, P)

rng = np.random.default_rng(7)


def to_limbs(vals):
    """ints -> list of NLIMBS int32 arrays (canonical limbs, batch last)."""
    vals = list(vals)
    return [
        jnp.asarray([(v >> (RADIX_BITS * i)) & MASK for v in vals], jnp.int32)
        for i in range(NLIMBS)
    ]


def from_limbs(limbs):
    arrs = [np.asarray(l, dtype=np.int64) for l in limbs]
    n = arrs[0].shape[0]
    return [
        sum(int(a[j]) << (RADIX_BITS * i) for i, a in enumerate(arrs))
        for j in range(n)
    ]


def rand_vals(n, bound):
    edge = [0, 1, P - 1, P, bound - 1]
    nbits = bound.bit_length() + 8
    out = []
    while len(out) < max(0, n - len(edge)):
        v = int.from_bytes(rng.bytes((nbits + 7) // 8), "little") % bound
        out.append(v)
    return (edge + out)[:n]


def test_prod_finalize():
    a = rand_vals(8, 2 * P)
    b = rand_vals(8, 2 * P)
    w = W.kw_prod(to_limbs(a), to_limbs(b), 2 * P, 2 * P)
    got = from_limbs(W.kw_finalize(w))
    for g, x, y in zip(got, a, b):
        assert g < 2 * P
        assert g % P == (x * y * RINV) % P


def test_sub_accumulate():
    a, b, c = (rand_vals(8, 2 * P) for _ in range(3))
    d = rand_vals(8, 2 * P)
    # a*b - c*d + a*d
    w = W.kw_sub(
        W.kw_prod(to_limbs(a), to_limbs(b), 2 * P, 2 * P),
        W.kw_prod(to_limbs(c), to_limbs(d), 2 * P, 2 * P),
    )
    w = W.kw_add(w, W.kw_prod(to_limbs(a), to_limbs(d), 2 * P, 2 * P))
    got = from_limbs(W.kw_finalize(w))
    for g, x, y, u, v in zip(got, a, b, c, d):
        assert g % P == ((x * y - u * v + x * v) * RINV) % P


def _k2(vals0, vals1, bound):
    return W.K2(to_limbs(vals0), to_limbs(vals1), bound)


def test_k2w_mul():
    a0, a1, b0, b1 = (rand_vals(8, 2 * P) for _ in range(4))
    c0, c1 = W.kw2_finalize(
        W.k2w_mul(_k2(a0, a1, 2 * P), _k2(b0, b1, 2 * P))
    )
    g0, g1 = from_limbs(c0), from_limbs(c1)
    for i in range(8):
        assert g0[i] % P == ((a0[i] * b0[i] - a1[i] * b1[i]) * RINV) % P
        assert g1[i] % P == ((a0[i] * b1[i] + a1[i] * b0[i]) * RINV) % P


def test_k2w_sq():
    a0, a1 = rand_vals(8, 2 * P), rand_vals(8, 2 * P)
    c0, c1 = W.kw2_finalize(W.k2w_sq(_k2(a0, a1, 2 * P)))
    g0, g1 = from_limbs(c0), from_limbs(c1)
    for i in range(8):
        assert g0[i] % P == ((a0[i] ** 2 - a1[i] ** 2) * RINV) % P
        assert g1[i] % P == (2 * a0[i] * a1[i] * RINV) % P


def test_kw2_xi():
    a0, a1, b0, b1 = (rand_vals(8, 2 * P) for _ in range(4))
    w = W.k2w_mul(_k2(a0, a1, 2 * P), _k2(b0, b1, 2 * P))
    c0, c1 = W.kw2_finalize(W.kw2_xi(w))
    g0, g1 = from_limbs(c0), from_limbs(c1)
    for i in range(8):
        m0 = a0[i] * b0[i] - a1[i] * b1[i]
        m1 = a0[i] * b1[i] + a1[i] * b0[i]
        assert g0[i] % P == ((9 * m0 - m1) * RINV) % P
        assert g1[i] % P == ((m0 + 9 * m1) * RINV) % P


def test_unordered_pair_identity():
    """2*Ai*Aj = (Ai+Aj)^2 - Ai^2 - Aj^2 at the KW level (the dense-square
    core's load-bearing identity), including the worst accumulation shape:
    xi * (P - Di - Dj)."""
    a0, a1, b0, b1 = (rand_vals(8, 2 * P) for _ in range(4))
    A = _k2(a0, a1, 2 * P)
    B = _k2(b0, b1, 2 * P)
    S = W.k2_sum(A, B)
    cross = W.kw2_sub(W.kw2_sub(W.k2w_sq(S), W.k2w_sq(A)), W.k2w_sq(B))
    c0, c1 = W.kw2_finalize(W.kw2_xi(cross))
    g0, g1 = from_limbs(c0), from_limbs(c1)
    for i in range(8):
        # 2*(A*B) in Fq2, then xi
        m0 = 2 * (a0[i] * b0[i] - a1[i] * b1[i])
        m1 = 2 * (a0[i] * b1[i] + a1[i] * b0[i])
        assert g0[i] % P == ((9 * m0 - m1) * RINV) % P
        assert g1[i] % P == ((m0 + 9 * m1) * RINV) % P


def test_budget_assert_trips():
    """The R*p budget assert must fire before silent wrap, not after."""
    a = to_limbs(rand_vals(4, 2 * P))
    with pytest.raises(AssertionError):
        w = W.kw_prod(a, a, 2 * P, 2 * P)
        for _ in range(25):  # 2^25 * 4p^2 > R*p
            w = W.kw_scale(w, 2)
        W.kw_finalize(w)


def test_kara_position_bounds_sound():
    """The Karatsuba kw_prod's claimed per-position bounds must dominate
    the actual carried positions (adversarial all-max-limb operands)."""
    worst = [(1 << (RADIX_BITS * NLIMBS)) - 1]  # all limbs = MASK
    vals = worst + rand_vals(31, 2 * P)
    a, b = to_limbs(vals), to_limbs(list(reversed(vals)))
    w = W.kw_prod(a, b, 1 << (RADIX_BITS * NLIMBS), 1 << (RADIX_BITS * NLIMBS))
    for k, pos in enumerate(w.pos):
        arr = np.asarray(pos, np.int64)
        assert arr.max() <= w.pb[k], f"pos {k}: {arr.max()} > pb {w.pb[k]}"
        assert -arr.min() <= w.nb[k], f"pos {k}: {arr.min()} < -nb {w.nb[k]}"


def test_kara_matches_schoolbook_fallback():
    """Karatsuba and schoolbook kw_prod finalize to the same residues."""
    a_v = rand_vals(8, 4 * P)
    b_v = rand_vals(8, 4 * P)
    a, b = to_limbs(a_v), to_limbs(b_v)
    kara = from_limbs(W.kw_finalize(W.kw_prod(a, b, 4 * P, 4 * P)))
    # force the schoolbook path
    w = K.k_carry(K.k_pad(K.k_mul_wide(a, b), K.WIDE), 1)
    sb = W.KW(list(w), W._prod_pb_1r(MASK + 2, MASK + 2, 16 * P * P),
              (0,) * K.WIDE, 16 * P * P, 0)
    school = from_limbs(W.kw_finalize(sb))
    for x, y in zip(kara, school):
        assert x % P == y % P
