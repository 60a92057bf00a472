"""Fused Pallas kernel tests (interpret mode on CPU): backend equivalence.

The pallas and xla backends must produce bit-identical canonical values;
these tests force the pallas path end-to-end on the CPU interpreter.
"""

import random

import jax
import numpy as np
import pytest

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.ops import dispatch
from pairing_tpu.pairing import api, final_exp
from pairing_tpu.utils import bn254 as c

RNG = random.Random(1001)


@pytest.fixture(autouse=True)
def _reset_backend():
    yield
    dispatch.force_backend(None)


def test_pow_ladder_backend_equivalence():
    g1 = o.g1_mul(c.G1_GEN, 9)
    g2 = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), 11)
    m_int = o.easy_part(o.miller_loop(g2, g1))
    m = F12.fq12_from_int_coeffs([m_int])

    dispatch.force_backend("pallas")
    got = jax.jit(final_exp.pow_x_cyclotomic)(m)
    dispatch.force_backend(None)
    assert F12.fq12_to_int_coeffs(got) == [o.pow_fq12(m_int, c.BN_X)]


def test_pairing_pallas_backend_bit_exact():
    g1p = o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR))
    g2p = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
    p = G1m.g1_from_ints([g1p])
    q = G2m.g2_from_ints([g2p])

    dispatch.force_backend("pallas")
    e = jax.jit(api.pairing)(p, q)
    dispatch.force_backend(None)
    assert F12.fq12_to_int_coeffs(e) == [o.pairing(g1p, g2p)]


def test_multi_miller_pallas_backend():
    K = 2
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(K)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(K)
    ]
    from pairing_tpu.pairing import miller_loop as ML

    dispatch.force_backend("pallas")
    f = jax.jit(ML.multi_miller_loop)(
        G2m.g2_from_ints(g2s), G1m.g1_from_ints(g1s)
    )
    dispatch.force_backend(None)
    assert F12.fq12_to_int_coeffs(f) == [
        o.multi_miller_loop(list(zip(g1s, g2s)))
    ]
