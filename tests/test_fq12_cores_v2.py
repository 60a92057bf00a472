"""Eager (non-Pallas) bit-exactness of the v2 Fq12 product cores.

The v2 cores (unordered-pair + Fq2-Karatsuba, ops/fq12_kernels) are plain
functions of getter/setter callbacks, so they run eagerly on [1]-shaped
arrays without tracing a kernel — this validates the full core arithmetic
(and every KW bound assertion fires at call time) in seconds, where the
interpret-mode Pallas tests need minutes of XLA-CPU compile.

Algorithm parity: same coefficient-basis product as the oracle's
sparse_fp12_multiply (miller_loop_native.rs:46-96).
"""

import random

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import pytest

from pairing_tpu.fields.fp import MASK, NLIMBS, RADIX_BITS
from pairing_tpu.oracle import native as o
from pairing_tpu.ops import fq12_kernels as OK
from pairing_tpu.utils.bn254 import P

RNG = random.Random(123)
R = 1 << (RADIX_BITS * NLIMBS)
R_INV = pow(R, -1, P)


def to_mont_limbs(x):
    m = (x * R) % P
    return [jnp.asarray([(m >> (RADIX_BITS * i)) & MASK], jnp.int32)
            for i in range(NLIMBS)]


def from_mont_limbs(ls):
    v = sum(int(l[0]) << (RADIX_BITS * i) for i, l in enumerate(ls))
    return (v * R_INV) % P


def pack(coeffs):
    """12 oracle ints (slot i = (coeffs[i], coeffs[i+6])) -> (c, l) tiles."""
    store = {}
    for i in range(6):
        for cc, v in enumerate((coeffs[i], coeffs[i + 6])):
            ls = to_mont_limbs(v)
            for l in range(NLIMBS):
                store[(2 * i + cc, l)] = ls[l]
    return store


def unpack(store):
    out = [0] * 12
    for i in range(6):
        out[i] = from_mont_limbs([store[(2 * i, l)] for l in range(NLIMBS)])
        out[i + 6] = from_mont_limbs(
            [store[(2 * i + 1, l)] for l in range(NLIMBS)])
    return out


def collect_out():
    out = {}

    def out_set(seg, limbs):
        for l in range(NLIMBS):
            out[(seg, l)] = limbs[l]

    return out, out_set


def rand12():
    return [RNG.randrange(P) for _ in range(12)]


def test_mul_core_v2_dense():
    xs, ys = rand12(), rand12()
    a, b = pack(xs), pack(ys)
    out, out_set = collect_out()
    OK._mul_core_v2(lambda c, l: a[(c, l)], lambda c, l: b[(c, l)], out_set)
    assert unpack(out) == list(o.fq12_mul(xs, ys))


def test_sq_core_v2():
    xs = rand12()
    a = pack(xs)
    out, out_set = collect_out()
    OK._sq_core_v2(lambda c, l: a[(c, l)], out_set)
    assert unpack(out) == list(o.fq12_mul(xs, xs))


@pytest.mark.parametrize("present", [(0, 3, 4), (2, 3, 5)])
def test_sparse_core_v2(present):
    xs = rand12()
    line = [(RNG.randrange(P), RNG.randrange(P)) if j in present else None
            for j in range(6)]
    bfull = [0] * 12
    for j in range(6):
        if line[j]:
            bfull[j], bfull[j + 6] = line[j]
    a, b = pack(xs), pack(bfull)
    out, out_set = collect_out()
    OK._sparse_core_v2(
        present,
        lambda c, l: a[(c, l)],
        lambda jj, cc, l: b[(2 * present[jj] + cc, l)],
        out_set,
    )
    assert unpack(out) == list(o.sparse_fp12_multiply(xs, line))


def test_edge_values():
    """Zero, one, p-1 coefficients through the dense cores."""
    patterns = [
        [0] * 12,
        [1] + [0] * 11,
        [P - 1] * 12,
        [0, P - 1] * 6,
    ]
    for xs in patterns:
        a = pack(xs)
        out, out_set = collect_out()
        OK._sq_core_v2(lambda c, l: a[(c, l)], out_set)
        assert unpack(out) == list(o.fq12_mul(xs, xs))


# --- v3 cores (two-level Karatsuba) — THE production dense-mul core -------
# _mul_core_v3 is wired into _mul_kernel_v2 and every fused pow ladder
# (ops/fused_kernels.py); these eager cases make CPU CI fail if its term
# table regresses. _sq_core_v3 is probe-only (measured neutral) but kept
# bit-exact here so a future adoption starts from a tested core.


def test_mul_core_v3_dense():
    xs, ys = rand12(), rand12()
    a, b = pack(xs), pack(ys)
    out, out_set = collect_out()
    OK._mul_core_v3(lambda c, l: a[(c, l)], lambda c, l: b[(c, l)], out_set)
    assert unpack(out) == list(o.fq12_mul(xs, ys))


def test_sq_core_v3():
    xs = rand12()
    a = pack(xs)
    out, out_set = collect_out()
    OK._sq_core_v3(lambda c, l: a[(c, l)], out_set)
    assert unpack(out) == list(o.fq12_mul(xs, xs))


def test_edge_values_v3():
    patterns = [
        [0] * 12,
        [1] + [0] * 11,
        [P - 1] * 12,
        [0, P - 1] * 6,
    ]
    for xs in patterns:
        a = pack(xs)
        out, out_set = collect_out()
        OK._mul_core_v3(
            lambda c, l: a[(c, l)], lambda c, l: a[(c, l)], out_set)
        assert unpack(out) == list(o.fq12_mul(xs, xs))
        out2, out_set2 = collect_out()
        OK._sq_core_v3(lambda c, l: a[(c, l)], out_set2)
        assert unpack(out2) == list(o.fq12_mul(xs, xs))
