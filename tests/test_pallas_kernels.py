"""Pallas Fq12 kernel tests (interpret mode on CPU) vs the XLA path.

The v2 product-core kernels produce interpret-mode programs XLA-CPU takes
>10 min to compile, so those are gated like the fused-kernel tests; the
core arithmetic is covered fast by tests/test_fq12_cores_v2.py (eager)
and on hardware by tpu_validate.py.
"""

import os
import random

import jax
import pytest

slow = pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in os.environ,
    reason="v2 kernel interpret-mode compile; slow on CPU "
    "(set PAIRING_SLOW_TESTS=1)",
)

from pairing_tpu.fields import fp2 as F2
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.ops import fq12_kernels as OK
from pairing_tpu.utils.bn254 import P

RNG = random.Random(2718)
B = 4


def rand_fq12_batch(n=B):
    return [[RNG.randrange(P) for _ in range(12)] for _ in range(n)]


def test_kernel_layout_roundtrip():
    xs = rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    arr, bs, pad = OK.to_kernel_layout(a)
    assert arr.shape == (12, 21, 8, 128)
    back = OK.from_kernel_layout(arr, bs, pad)
    assert F12.fq12_to_int_coeffs(back) == xs


@slow
def test_fq12_mul_kernel_dense():
    xs, ys = rand_fq12_batch(), rand_fq12_batch()
    a = F12.fq12_from_int_coeffs(xs)
    b = F12.fq12_from_int_coeffs(ys)
    got = jax.jit(lambda a, b: OK.fq12_mul_pallas(a, b, interpret=True))(a, b)
    assert F12.fq12_to_int_coeffs(got) == [
        o.fq12_mul(x, y) for x, y in zip(xs, ys)
    ]


@slow
@pytest.mark.parametrize("pattern", [(0, 3, 4), (2, 3, 5)])
def test_fq12_mul_kernel_sparse(pattern):
    xs = rand_fq12_batch()
    line = {j: [(RNG.randrange(P), RNG.randrange(P)) for _ in range(B)] for j in pattern}
    a = F12.fq12_from_int_coeffs(xs)
    slots = {j: F2.fp2_stack_from_ints(line[j]) for j in pattern}
    got = jax.jit(
        lambda a, s: OK.fq12_mul_sparse_pallas(a, s, interpret=True)
    )(a, slots)
    expect = []
    for bi in range(B):
        sparse = [line[j][bi] if j in pattern else None for j in range(6)]
        expect.append(o.sparse_fp12_multiply(xs[bi], sparse))
    assert F12.fq12_to_int_coeffs(got) == expect


def test_fp_pow_kernel_inverse():
    from pairing_tpu.fields import fp as F
    from pairing_tpu.ops.fp_kernels import (
        fp_from_kernel_layout,
        fp_pow_bits_pallas,
        fp_to_kernel_layout,
    )

    # interpret mode unrolls the step grid: use a short exponent on CPU
    # (full p-2 ladder validated on TPU by tpu_validate.py)
    e = 0b110101
    xs = [RNG.randrange(1, P) for _ in range(8)]
    a = F.to_mont(F.fp_from_ints(xs))

    @jax.jit
    def run(a):
        arr, bs, pad = fp_to_kernel_layout(F._cap_2p(a).limbs)
        out = fp_pow_bits_pallas(arr, e, interpret=True)
        return F.Fp(fp_from_kernel_layout(out, bs, pad), 2 * P, F.SETTLED)

    powed = run(a)
    vals = F.fp_to_ints(F.canonical(F.from_mont(powed)))
    for x, v in zip(xs, vals):
        assert v == pow(x, e, P)
