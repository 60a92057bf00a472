"""Fq2 / Fq12 tower tests vs the Python-int oracle (golden values)."""

import random

import jax
import pytest

from pairing_tpu.fields import fp as F
from pairing_tpu.fields import fp2 as F2
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.utils.bn254 import P

RNG = random.Random(99)
B = 4  # batch size for tests


def rand_fq2_batch():
    return [(RNG.randrange(P), RNG.randrange(P)) for _ in range(B)]


def rand_fq12_batch():
    return [[RNG.randrange(P) for _ in range(12)] for _ in range(B)]


def check_fq2(got: F2.Fp2, expected):
    vals = F2.fp2_to_ints(got, mont=True)
    assert [tuple(map(int, v)) for v in vals] == list(expected)


def check_fq12(got: F12.Fq12, expected):
    vals = F12.fq12_to_int_coeffs(got)
    assert vals == [list(e) for e in expected]


# ---------------------------------------------------------------------------
# Fq2
# ---------------------------------------------------------------------------


def test_fp2_mul_square_w6():
    xs, ys = rand_fq2_batch(), rand_fq2_batch()
    a = F2.fp2_stack_from_ints(xs)
    b = F2.fp2_stack_from_ints(ys)
    check_fq2(jax.jit(F2.mul)(a, b), [o.fq2_mul(x, y) for x, y in zip(xs, ys)])
    check_fq2(jax.jit(F2.square)(a), [o.fq2_mul(x, x) for x in xs])
    check_fq2(
        jax.jit(F2.mul_w6)(a), [o.fq2_mul(x, (9, 1)) for x in xs]
    )
    check_fq2(jax.jit(F2.conj)(a), [o.fq2_conj(x) for x in xs])
    check_fq2(jax.jit(F2.neg_conj)(a), [o.fq2_neg_conj(x) for x in xs])
    check_fq2(
        jax.jit(lambda a, b: F2.sub(F2.add(a, b), b))(a, b), xs
    )


def test_fp2_inv():
    xs = rand_fq2_batch()
    a = F2.fp2_stack_from_ints(xs)
    inv = jax.jit(F2.inv)(a)
    check_fq2(inv, [o.fq2_inv(x) for x in xs])


def test_fp2_scale_mul_fp():
    xs = rand_fq2_batch()
    ks = [RNG.randrange(P) for _ in range(B)]
    a = F2.fp2_stack_from_ints(xs)
    k = F.to_mont(F.fp_from_ints(ks))
    got = jax.jit(F2.mul_fp)(a, k)
    check_fq2(got, [o.fq2_scale(x, kk) for x, kk in zip(xs, ks)])
    check_fq2(jax.jit(lambda a: F2.scale(a, 3))(a), [o.fq2_scale(x, 3) for x in xs])


# ---------------------------------------------------------------------------
# Fq12
# ---------------------------------------------------------------------------


def test_fq12_roundtrip():
    xs = rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    assert F12.fq12_to_int_coeffs(a) == xs


def test_fq12_mul_dense():
    xs, ys = rand_fq12_batch(), rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    b = F12.fq12_from_int_coeffs(ys)
    got = jax.jit(F12.fq12_mul)(a, b)
    check_fq12(got, [o.fq12_mul(x, y) for x, y in zip(xs, ys)])


def test_fq12_sq():
    xs = rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    check_fq12(jax.jit(F12.fq12_sq)(a), [o.fq12_mul(x, x) for x in xs])


@pytest.mark.parametrize("pattern", [F12.LINE_EQUAL_SLOTS, F12.LINE_UNEQUAL_SLOTS])
def test_fq12_mul_sparse(pattern):
    xs = rand_fq12_batch()
    line = {j: rand_fq2_batch() for j in pattern}
    a = F12.fq12_from_int_coeffs(xs)
    slots = {j: F2.fp2_stack_from_ints(line[j]) for j in pattern}
    got = jax.jit(lambda a, s: F12.fq12_mul_sparse(a, s))(a, slots)
    expect = []
    for bi in range(B):
        sparse = [line[j][bi] if j in pattern else None for j in range(6)]
        expect.append(o.sparse_fp12_multiply(xs[bi], sparse))
    check_fq12(got, expect)


def test_fq12_conjugate():
    xs = rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    check_fq12(jax.jit(F12.conjugate)(a), [o.fq12_conj(x) for x in xs])


@pytest.mark.parametrize("power", [1, 2, 3, 6, 11, 0])
def test_fq12_frobenius(power):
    xs = rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    got = jax.jit(lambda a: F12.frobenius_map(a, power))(a)
    check_fq12(got, [o.frobenius_map(x, power) for x in xs])


def test_fq12_inv_div():
    xs, ys = rand_fq12_batch(), rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    b = F12.fq12_from_int_coeffs(ys)
    inv = jax.jit(F12.fq12_inv)(a)
    check_fq12(inv, [o.fq12_inv(x) for x in xs])
    div = jax.jit(F12.fq12_div)(a, b)
    check_fq12(div, [o.fq12_div(x, y) for x, y in zip(xs, ys)])


def test_fq12_mul_chain():
    # chained products stay bounded and bit-exact
    xs = rand_fq12_batch()
    ys = rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    b = F12.fq12_from_int_coeffs(ys)

    @jax.jit
    def chain(a, b):
        for _ in range(8):
            a = F12.fq12_mul(F12.fq12_sq(a), b)
        return a

    got = chain(a, b)
    expect = xs
    expect = [list(e) for e in expect]
    for _ in range(8):
        expect = [o.fq12_mul(o.fq12_mul(e, e), y) for e, y in zip(expect, ys)]
    check_fq12(got, expect)
