"""End-to-end pairing tests: bit-exact vs the Python-int oracle.

Covers BASELINE.json configs 1-2 and re-expresses the reference's
tier-1/tier-3 tests (SURVEY.md §4) against the TPU kernel path.
"""

import random

import jax
import pytest

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.pairing import api, final_exp, miller_loop
from pairing_tpu.utils import bn254 as c

RNG = random.Random(42)
B = 2

G1GEN = c.G1_GEN
G2GEN = (c.G2_GEN_X, c.G2_GEN_Y)


def rand_points(n):
    g1s = [o.g1_mul(G1GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(n)]
    g2s = [o.g2_mul(G2GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(n)]
    return g1s, g2s


def test_miller_loop_bit_exact():
    g1s, g2s = rand_points(B)
    p = G1m.g1_from_ints(g1s)
    q = G2m.g2_from_ints(g2s)
    f = jax.jit(miller_loop.miller_loop)(q, p)
    got = F12.fq12_to_int_coeffs(f)
    expect = [o.miller_loop(qq, pp) for pp, qq in zip(g1s, g2s)]
    assert got == expect


def test_final_exp_bit_exact():
    g1s, g2s = rand_points(1)
    m_int = o.miller_loop(g2s[0], g1s[0])
    m = F12.fq12_from_int_coeffs([m_int])
    out = jax.jit(final_exp.final_exp)(m)
    assert F12.fq12_to_int_coeffs(out) == [o.final_exp(m_int)]


def test_pow_x_cyclotomic_bit_exact():
    g1s, g2s = rand_points(1)
    m_int = o.easy_part(o.miller_loop(g2s[0], g1s[0]))  # cyclotomic element
    m = F12.fq12_from_int_coeffs([m_int])
    out = jax.jit(final_exp.pow_x_cyclotomic)(m)
    assert F12.fq12_to_int_coeffs(out) == [o.pow_fq12(m_int, c.BN_X)]


def test_pairing_bit_exact_and_bilinear():
    # config 1: single ate pairing bilinearity check, bit-exact vs native
    a, b = 29, 61
    p_pts = [G1GEN, o.g1_mul(G1GEN, a)]
    q_pts = [G2GEN, o.g2_mul(G2GEN, b)]
    p = G1m.g1_from_ints(p_pts)
    q = G2m.g2_from_ints(q_pts)
    e = jax.jit(api.pairing)(p, q)
    got = F12.fq12_to_int_coeffs(e)
    expect = [o.pairing(pp, qq) for pp, qq in zip(p_pts, q_pts)]
    assert got == expect
    # bilinearity: e(aP, bQ) == e(P,Q)^(ab)
    assert got[1] == o.pow_fq12(expect[0], a * b)


def test_multi_miller_loop_bit_exact():
    # config 2 shape: product of K pairings, shared squarings
    K = 3
    g1s, g2s = rand_points(K)
    ps = G1m.g1_from_ints(g1s)  # [K]
    qs = G2m.g2_from_ints(g2s)
    # add singleton inner batch axis: core expects [K, ...]
    f = jax.jit(miller_loop.multi_miller_loop)(qs, ps)
    got = F12.fq12_to_int_coeffs(f)
    expect = o.multi_miller_loop(list(zip(g1s, g2s)))
    assert got == [expect]


def test_to_one_product_of_pairings():
    # reference test_to_one (final_exp_native.rs:240-264)
    s, t = 5, 6
    p_pts = [o.g1_mul(G1GEN, s), o.g1_mul(G1GEN, s * t)]
    q_pts = [o.g2_mul(G2GEN, t), o.g2_neg(G2GEN)]
    ps = G1m.g1_from_ints(p_pts)
    qs = G2m.g2_from_ints(q_pts)
    out = jax.jit(api.multi_pairing)(ps, qs)
    assert F12.fq12_to_int_coeffs(out) == [o.fq12_one()]


def test_fq12_pow_general():
    # pow_native parity: arbitrary element, arbitrary exponent (with -1
    # NAF digits exercising the true-inverse path)
    rng = random.Random(11)
    x = [rng.randrange(c.P) for _ in range(12)]
    e = 0b101101110101  # NAF has -1 digits
    a = F12.fq12_from_int_coeffs([x])
    got = jax.jit(lambda a: final_exp.fq12_pow(a, e))(a)
    assert F12.fq12_to_int_coeffs(got) == [o.pow_fq12(x, e)]
