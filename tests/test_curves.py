"""G1/G2 curve-op tests vs the Python-int oracle."""

import random

import jax
import pytest

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.fields import fp2 as F2
from pairing_tpu.oracle import native as o
from pairing_tpu.utils import bn254 as c

RNG = random.Random(7)
B = 3

G1GEN = c.G1_GEN
G2GEN = (c.G2_GEN_X, c.G2_GEN_Y)


def rand_g2_points():
    return [o.g2_mul(G2GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(B)]


def rand_g1_points():
    return [o.g1_mul(G1GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(B)]


def test_g1_roundtrip_oncurve():
    pts = rand_g1_points()
    g = G1m.g1_from_ints(pts)
    assert G1m.g1_to_ints(g) == pts
    assert bool(jax.jit(G1m.g1_on_curve)(g).all())
    neg = G1m.g1_neg(g)
    assert G1m.g1_to_ints(neg) == [o.g1_neg(p) for p in pts]


def test_g2_roundtrip_oncurve_neg():
    pts = rand_g2_points()
    g = G2m.g2_from_ints(pts)
    assert G2m.g2_to_ints(g) == pts
    assert bool(jax.jit(G2m.g2_on_curve)(g).all())
    neg = G2m.g2_neg(g)
    assert G2m.g2_to_ints(neg) == [o.g2_neg(p) for p in pts]


def test_g2_affine_double_add():
    pts = rand_g2_points()
    pts2 = rand_g2_points()
    a = G2m.g2_from_ints(pts)
    b = G2m.g2_from_ints(pts2)
    dbl = jax.jit(G2m.g2_double_affine)(a)
    assert G2m.g2_to_ints(dbl) == [o.g2_double(p) for p in pts]
    add = jax.jit(G2m.g2_add_affine)(a, b)
    assert G2m.g2_to_ints(add) == [o.g2_add(p, q) for p, q in zip(pts, pts2)]


def test_jacobian_trajectory_matches_affine():
    # double/add in Jacobian, then one bulk normalization -> same points
    pts = rand_g2_points()
    pts2 = rand_g2_points()
    a = G2m.g2_from_ints(pts)
    b = G2m.g2_from_ints(pts2)

    @jax.jit
    def run(a, b):
        j = G2m.jac_from_affine(a)
        j1 = G2m.jac_double(j)  # 2a
        j2 = G2m.jac_mixed_add(j1, b)  # 2a + b
        j3 = G2m.jac_double(j2)  # 2(2a+b)
        import jax.numpy as jnp

        stack = G2m.G2Jac(
            F2.from_limbs(
                tuple(
                    jnp.stack([x[i] for x in (F2.to_limbs(F2.cap(j1.X)), F2.to_limbs(F2.cap(j2.X)), F2.to_limbs(F2.cap(j3.X)))])
                    for i in range(2)
                )
            ),
            F2.from_limbs(
                tuple(
                    jnp.stack([x[i] for x in (F2.to_limbs(F2.cap(j1.Y)), F2.to_limbs(F2.cap(j2.Y)), F2.to_limbs(F2.cap(j3.Y)))])
                    for i in range(2)
                )
            ),
            F2.from_limbs(
                tuple(
                    jnp.stack([x[i] for x in (F2.to_limbs(F2.cap(j1.Z)), F2.to_limbs(F2.cap(j2.Z)), F2.to_limbs(F2.cap(j3.Z)))])
                    for i in range(2)
                )
            ),
        )
        return G2m.batch_to_affine(stack)

    aff = run(a, b)
    got = G2m.g2_to_ints(aff)
    exp = []
    for p, q in zip(pts, pts2):
        d = o.g2_double(p)
        s = o.g2_add(d, q)
        d2 = o.g2_double(s)
        exp.append((d, s, d2))
    # got is flattened [3, B] -> row-major over the stacked axis
    exp_flat = []
    for i in range(3):
        for bi in range(B):
            exp_flat.append(exp[bi][i])
    assert got == exp_flat


def test_twisted_frobenius():
    pts = rand_g2_points()
    g = G2m.g2_from_ints(pts)
    tf = jax.jit(G2m.twisted_frobenius)(g)
    assert G2m.g2_to_ints(tf) == [o.twisted_frobenius(p) for p in pts]
    ntf = jax.jit(G2m.neg_twisted_frobenius)(tf)
    assert G2m.g2_to_ints(ntf) == [
        o.neg_twisted_frobenius(o.twisted_frobenius(p)) for p in pts
    ]
