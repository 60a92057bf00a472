"""Direct tests of the in-kernel limb arithmetic (pure jnp, no pallas).

kernel_core functions are plain traced ops on [8,128] int32 tiles, so the
math is validated here quickly on CPU; the pallas grid/ref plumbing is
validated by test_pallas_kernels (small kernels, interpret mode) and
tpu_validate.py (full-length, real hardware).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairing_tpu.fields import fp as F
from pairing_tpu.ops import kernel_core as K
from pairing_tpu.oracle import native as o
from pairing_tpu.utils import bn254 as c
from pairing_tpu.utils.bn254 import P

RNG = random.Random(4242)


def tile_of(val_mont: int):
    """Broadcast a (Montgomery-domain) int into a limb list of [8,128]."""
    limbs = F.int_to_limbs(val_mont)
    return [jnp.full((8, 128), int(x), jnp.int32) for x in limbs]


def tile_to_int(limbs):
    vals = [int(np.asarray(x)[0, 0]) for x in limbs]
    return sum(v << (13 * i) for i, v in enumerate(vals))


def mont(x):
    return x * F.R_MONT % P


def unmont(x):
    return x * pow(F.R_MONT, -1, P) % P


def test_k_mont_mul():
    xs = [RNG.randrange(P) for _ in range(4)]
    ys = [RNG.randrange(P) for _ in range(4)]
    for x, y in zip(xs, ys):
        got = jax.jit(
            lambda: K.k_mont_mul(tile_of(mont(x)), tile_of(mont(y)))
        )()
        assert tile_to_int(got) % P == mont(x * y % P)


def test_k2_mul_square():
    x = (RNG.randrange(P), RNG.randrange(P))
    y = (RNG.randrange(P), RNG.randrange(P))
    a = (tile_of(mont(x[0])), tile_of(mont(x[1])))
    b = (tile_of(mont(y[0])), tile_of(mont(y[1])))
    got = jax.jit(lambda: K.k2_mul(a, b))()
    exp = o.fq2_mul(x, y)
    assert (tile_to_int(got[0]) % P, tile_to_int(got[1]) % P) == (
        mont(exp[0]),
        mont(exp[1]),
    )
    gots = jax.jit(lambda: K.k2_square(a))()
    exps = o.fq2_mul(x, x)
    assert (tile_to_int(gots[0]) % P, tile_to_int(gots[1]) % P) == (
        mont(exps[0]),
        mont(exps[1]),
    )


def test_k_cyc_sq():
    g1 = o.g1_mul(c.G1_GEN, 7)
    g2 = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), 13)
    z = o.easy_part(o.miller_loop(g2, g1))
    slots_int = o.fq12_to_fq2_slots(z)
    slots = [
        (tile_of(mont(s[0])), tile_of(mont(s[1]))) for s in slots_int
    ]
    got = jax.jit(lambda: K.k_cyc_sq(slots))()
    expect = o.fq12_to_fq2_slots(o.cyclotomic_square(z))
    for i in range(6):
        assert tile_to_int(got[i][0]) % P == mont(expect[i][0]), i
        assert tile_to_int(got[i][1]) % P == mont(expect[i][1]), i


def test_k_sub_neg_scale():
    x, y = RNG.randrange(P), RNG.randrange(P)
    a, b = tile_of(mont(x)), tile_of(mont(y))
    assert tile_to_int(jax.jit(lambda: K.k_sub_2p(a, b))()) % P == mont(
        (x - y) % P
    )
    assert tile_to_int(jax.jit(lambda: K.k_neg_2p(a))()) % P == mont(
        (P - x) % P
    )
    assert tile_to_int(jax.jit(lambda: K.k_scale(a, 9))()) % P == mont(
        9 * x % P
    )
