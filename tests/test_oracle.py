"""Tier-1 tests: mathematical self-consistency of the pure-Python oracle.

Re-expresses the reference's native test suite (SURVEY.md §4):
  - test_multi_miller_loop_native (miller_loop_native.rs:336-348)
  - test_pow / final_exp vs direct pow (final_exp_native.rs:266-286)
  - test_to_one bilinearity shape (final_exp_native.rs:240-264)
  - test_pairing_final smoke (final_exp_native.rs:231-238)
plus stronger seeded property tests (bilinearity both sides, r-torsion).
"""

import random

import pytest

from pairing_tpu.oracle import native as o
from pairing_tpu.utils import bn254 as c

G1 = c.G1_GEN
G2 = (c.G2_GEN_X, c.G2_GEN_Y)


def rand_fq12(rng):
    return [rng.randrange(c.P) for _ in range(12)]


def rand_g1(rng):
    return o.g1_mul(G1, rng.randrange(1, c.R_SCALAR))


def rand_g2(rng):
    return o.g2_mul(G2, rng.randrange(1, c.R_SCALAR))


def test_naf_constants():
    assert list(c.SIX_U_PLUS_2_NAF) == [
        0, 0, 0, 1, 0, 1, 0, -1, 0, 0, 1, -1, 0, 0, 1, 0, 0, 1, 1, 0, -1, 0,
        0, 1, 0, -1, 0, 0, 0, 0, 1, 1, 1, 0, 0, -1, 0, 0, 1, 0, 0, 0, 0, 0,
        -1, 0, 0, 1, 1, 0, 0, -1, 0, 0, 0, 1, 1, 0, -1, 0, 0, 1, 0, 1, 1,
    ]
    assert sum(d * (1 << i) for i, d in enumerate(c.BN_X_NAF)) == c.BN_X
    assert all(d in (-1, 0, 1) for d in c.BN_X_NAF)


def test_fq12_mul_inverse_roundtrip():
    rng = random.Random(1)
    x = rand_fq12(rng)
    assert o.fq12_mul(x, o.fq12_inv(x)) == o.fq12_one()


def test_frobenius_is_pth_power():
    rng = random.Random(2)
    x = rand_fq12(rng)
    for k in (1, 2, 3, 6):
        assert o.frobenius_map(x, k) == o.pow_fq12(x, c.P**k), k


def test_conjugate_is_q6_frobenius():
    rng = random.Random(3)
    x = rand_fq12(rng)
    assert o.fq12_conj(x) == o.frobenius_map(x, 6)


def test_pow_matches_final_exp_direct():
    # reference test_pow (final_exp_native.rs:266-286)
    rng = random.Random(4)
    x = rand_fq12(rng)
    assert o.final_exp(x) == o.pow_fq12(x, c.FINAL_EXP_POWER)


def test_multi_miller_loop():
    # reference test_multi_miller_loop_native (miller_loop_native.rs:336-348)
    rng = random.Random(5)
    p0, p1 = rand_g1(rng), rand_g1(rng)
    q0, q1 = rand_g2(rng), rand_g2(rng)
    r0 = o.miller_loop(q0, p0)
    r1 = o.miller_loop(q1, p1)
    assert o.multi_miller_loop([(p0, q0), (p1, q1)]) == o.fq12_mul(r0, r1)


def test_to_one():
    # reference test_to_one (final_exp_native.rs:240-264): product-of-pairings
    # Groth16-verify shape with P1 = (s*t)G1, Q1 = -G2.
    s, t = 5, 6
    p0 = o.g1_mul(G1, s)
    q0 = o.g2_mul(G2, t)
    p1 = o.g1_mul(G1, s * t)
    q1 = o.g2_neg(G2)
    m = o.multi_miller_loop([(p0, q0), (p1, q1)])
    m0 = o.miller_loop(q0, p0)
    m1 = o.miller_loop(q1, p1)
    assert m == o.fq12_mul(m0, m1)
    r_sep = o.fq12_mul(o.final_exp(m0), o.final_exp(m1))
    r_mul = o.final_exp(m)
    assert r_sep == r_mul
    # and the product pairing is exactly 1
    assert r_mul == o.fq12_one()


def test_bilinearity():
    a, b = 29, 61
    e = o.pairing(G1, G2)
    e_ab = o.pairing(o.g1_mul(G1, a), o.g2_mul(G2, b))
    assert e_ab == o.pow_fq12(e, a * b)


def test_r_torsion():
    e = o.pairing(G1, G2)
    assert o.pow_fq12(e, c.R_SCALAR) == o.fq12_one()
    assert e != o.fq12_one()  # non-degenerate


def test_pairing_generator_smoke():
    # reference test_pairing_final (final_exp_native.rs:231-238)
    e = o.pairing(G1, G2)
    assert len(e) == 12 and all(0 <= x < c.P for x in e)


def test_tower_basis_roundtrip():
    rng = random.Random(77)
    x = rand_fq12(rng)
    tower = o.to_tower_basis(x)
    assert o.from_tower_basis(tower) == x
    # tower c0/c1 regrouping: product consistency through the basis change
    y = rand_fq12(rng)
    xy = o.fq12_mul(x, y)
    assert o.from_tower_basis(o.to_tower_basis(xy)) == xy
