"""Property tests for the vectorized Fq limb core vs Python-int oracle.

Exercises bound tracking, quasi-carry settling (incl. signed borrows),
Montgomery round-trips and the lazy wide-accumulator path.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairing_tpu.fields import fp as F
from pairing_tpu.utils.bn254 import P

RNG = random.Random(1234)


def rand_ints(n, lo=0, hi=P):
    return [RNG.randrange(lo, hi) for _ in range(n)]


def adversarial_ints(n):
    """Edge-case values: 0, 1, p-1, p-2, values with all-ones limbs, etc."""
    base = [0, 1, 2, P - 1, P - 2, P // 2, (1 << 253) - 1, (1 << 200)]
    vals = base + [RNG.randrange(P) | ((1 << 130) - 1) for _ in range(n)]
    return [v % P for v in vals]


def as_fp(xs):
    return F.fp_from_ints(xs)


def check_vals(a: F.Fp, expected):
    got = F.fp_to_ints(F.canonical(a))
    exp = [e % P for e in expected]
    assert list(got) == exp


def check_invariants(a: F.Fp):
    limbs = np.asarray(a.limbs)
    assert limbs.max() <= a.limb_bound, (limbs.max(), a.limb_bound)
    assert limbs.min() >= 0, limbs.min()
    vals = F.fp_to_ints(a)
    for v in vals:
        assert v < a.bound


def test_roundtrip():
    xs = rand_ints(16) + adversarial_ints(4)
    a = as_fp(xs)
    assert [int(v) for v in F.fp_to_ints(a)] == xs
    check_invariants(a)


def test_add_sub_neg():
    xs, ys = rand_ints(32), rand_ints(32)
    a, b = as_fp(xs), as_fp(ys)
    check_vals(F.fp_add(a, b), [x + y for x, y in zip(xs, ys)])
    s = F.fp_sub(a, b)
    check_invariants(s)
    check_vals(s, [x - y for x, y in zip(xs, ys)])
    n = F.fp_neg(a)
    check_invariants(n)
    check_vals(n, [-x for x in xs])


def test_sub_chains_signed_settling():
    # repeated subtraction exercises signed quasi-carry borrows
    xs = adversarial_ints(8)
    ys = adversarial_ints(8)[::-1]
    a, b = as_fp(xs), as_fp(ys)
    acc, acc_int = a, list(xs)
    for _ in range(6):
        acc = F.fp_sub(acc, b)
        acc_int = [x - y for x, y in zip(acc_int, ys)]
        check_invariants(acc)
    check_vals(acc, acc_int)


def test_mont_mul():
    xs, ys = rand_ints(32) + adversarial_ints(4), rand_ints(32) + adversarial_ints(4)[::-1]
    a = F.to_mont(as_fp(xs))
    b = F.to_mont(as_fp(ys))
    c = F.mont_mul(a, b)
    check_invariants(c)
    check_vals(F.from_mont(c), [x * y for x, y in zip(xs, ys)])


def test_mont_roundtrip():
    xs = rand_ints(16) + adversarial_ints(4)
    a = F.to_mont(as_fp(xs))
    check_vals(F.from_mont(a), xs)


def test_mul_chain_bound_stability():
    # 70 chained squarings: bounds must stay closed under iteration.
    # mont_mul maps (xR, xR) -> x^2 R, so the domain is preserved and
    # from_mont recovers plain x^(2^70).
    xs = rand_ints(8)
    expect = xs
    for _ in range(40):
        expect = [x * x % P for x in expect]

    @jax.jit
    def chain(a):
        for _ in range(40):
            a = F.mont_mul(a, a)
            assert a.bound < F.MAX_MUL_INPUT
        return F.from_mont(a)

    check_vals(chain(F.to_mont(as_fp(xs))), expect)


def test_wide_accumulation():
    # c = 9*(a0*b0) + a1*b1 + a2*b2 with one reduction
    a_int = [rand_ints(8) for _ in range(3)]
    b_int = [rand_ints(8) for _ in range(3)]
    a = [F.to_mont(as_fp(x)) for x in a_int]
    b = [F.to_mont(as_fp(x)) for x in b_int]
    acc = F.wide_scale(F.mul_wide(a[0], b[0]), 9)
    acc = F.wide_add(acc, F.mul_wide(a[1], b[1]))
    acc = F.wide_add(acc, F.mul_wide(a[2], b[2]))
    out = F.from_mont(F.mont_reduce(acc))
    expect = [
        (9 * x0 * y0 + x1 * y1 + x2 * y2) % P
        for (x0, y0, x1, y1, x2, y2) in zip(
            a_int[0], b_int[0], a_int[1], b_int[1], a_int[2], b_int[2]
        )
    ]
    check_vals(out, expect)


def test_scale():
    xs = rand_ints(16)
    a = as_fp(xs)
    check_vals(F.fp_scale(a, 9), [9 * x for x in xs])
    check_vals(F.fp_scale(a, 0), [0] * 16)


def test_pow_and_inv():
    xs = rand_ints(4, lo=1)
    a = F.to_mont(as_fp(xs))
    # fp_pow_const keeps the Montgomery domain: m(x)^3 -> m(x^3)
    cube = F.fp_pow_const(a, 3)
    check_vals(F.from_mont(cube), [pow(x, 3, P) for x in xs])
    # fp_inv: m(x) -> m(x^{-1}); defining property x * x^{-1} = 1
    inv = jax.jit(F.fp_inv)(a)
    vals = F.fp_to_ints(F.canonical(F.from_mont(inv)))
    for x, v in zip(xs, vals):
        assert v * x % P == 1
    # and in-domain: mont_mul(m(x), m(x^{-1})) == m(1) == R mod p
    rep = F.fp_to_ints(F.canonical(F.mont_mul(a, inv)))
    for v in rep:
        assert v == F.R_MOD_P


def test_select_eq():
    xs, ys = rand_ints(8), rand_ints(8)
    a, b = as_fp(xs), as_fp(ys)
    mask = jnp.asarray([True, False] * 4)
    sel = F.fp_select(mask, a, b)
    expect = [x if m else y for x, y, m in zip(xs, ys, [True, False] * 4)]
    check_vals(sel, expect)
    eq = F.fp_eq(a, F.fp_add(a, F.fp_from_int(0, (8,))))
    assert bool(jnp.all(eq))


def test_batch_inv():
    xs = rand_ints(6, lo=1)
    elems = [F.to_mont(as_fp([x])) for x in xs]
    invs = F.batch_inv(elems)
    for x, inv in zip(xs, invs):
        got = F.fp_to_ints(F.canonical(F.from_mont(inv)))[0]
        # mont-domain inverse of mont-domain x: represents x^{-1}
        assert got * x % P == 1


def test_jit_compatible():
    xs, ys = rand_ints(8), rand_ints(8)
    a, b = F.to_mont(as_fp(xs)), F.to_mont(as_fp(ys))

    @jax.jit
    def f(a, b):
        return F.mont_mul(F.fp_add(a, b), F.fp_sub(a, b))

    out = f(a, b)
    r_inv = pow(F.R_MONT, -1, P)
    # (a+b)(a-b) * R^{-1}; operands are xR,yR -> result (x^2-y^2) R^2 R^{-1}
    check_vals(
        F.from_mont(out), [(x * x - y * y) % P for x, y in zip(xs, ys)]
    )
