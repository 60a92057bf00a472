"""Kernel-layout-resident op tests (interpret mode on CPU) vs XLA path.

kinv and the full final_exp_k chain use multi-step VM/ladder grids that
interpret mode unrolls (untestable on CPU; covered by tpu_validate.py on
hardware). The single-step kernels are verified here bit-exactly.
"""

import os
import random

import jax
import pytest

#: kcyc_sq / kfrob fully unroll ~70k limb ops per kernel body — minutes of
#: XLA-CPU compile in interpret mode. Gated like the fused-kernel tests;
#: hardware bit-exactness is covered by tpu_validate.py.
slow = pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in os.environ,
    reason="unrolled kernel body; slow on CPU (set PAIRING_SLOW_TESTS=1)",
)

from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.ops import fq12_kernels as OK
from pairing_tpu.ops import klayout as KL
from pairing_tpu.utils.bn254 import P

RNG = random.Random(31337)
B = 4


def rand_coeffs(n=B):
    return [[RNG.randrange(P) for _ in range(12)] for _ in range(n)]


def to_k(coeffs):
    a = F12.fq12_from_int_coeffs(coeffs)
    return OK.to_kernel_layout(a)


def from_k(arr, bs, pad):
    return F12.fq12_to_int_coeffs(OK.from_kernel_layout(arr, bs, pad))


def test_kconj():
    xs = rand_coeffs()
    arr, bs, pad = to_k(xs)
    got = from_k(jax.jit(lambda a: KL.kconj(a, interpret=True))(arr), bs, pad)
    assert got == [o.fq12_conj(x) for x in xs]


@slow
@pytest.mark.parametrize("power", [1, 2, 3, 6, 11])
def test_kfrob(power):
    xs = rand_coeffs()
    arr, bs, pad = to_k(xs)
    got = from_k(
        jax.jit(lambda a: KL.kfrob(a, power, interpret=True))(arr), bs, pad
    )
    assert got == [o.frobenius_map(x, power) for x in xs]


@slow
def test_kcyc_sq():
    # cyclotomic elements: easy-part outputs of random Miller values
    xs = []
    for _ in range(B):
        m = [RNG.randrange(P) for _ in range(12)]
        xs.append(o.easy_part(m))
    arr, bs, pad = to_k(xs)
    got = from_k(jax.jit(lambda a: KL.kcyc_sq(a, interpret=True))(arr), bs, pad)
    assert got == [o.fq12_mul(x, x) for x in xs]


@slow
def test_sparse_to_k_and_mul():
    # kmul/_pallas_mul itself is covered by test_pallas_kernels; this
    # exercises the new sparse_to_k bridge + kmul_sparse entry.
    from pairing_tpu.fields import fp2 as F2

    xs = rand_coeffs()
    pattern = (2, 3, 5)
    line = {
        j: [(RNG.randrange(P), RNG.randrange(P)) for _ in range(B)]
        for j in pattern
    }
    ax, bs, pad = to_k(xs)
    slots = {j: F2.fp2_stack_from_ints(line[j]) for j in pattern}

    def run(a, s):
        lk = KL.sparse_to_k(s, a.shape[2])
        return KL.kmul_sparse(a, pattern, lk, interpret=True)

    got = from_k(jax.jit(run)(ax, slots), bs, pad)
    expect = []
    for bi in range(B):
        sparse = [line[j][bi] if j in pattern else None for j in range(6)]
        expect.append(o.sparse_fp12_multiply(xs[bi], sparse))
    assert got == expect
