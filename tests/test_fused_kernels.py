"""Fused Pallas kernel tests (interpret mode on CPU).

Interpret mode unrolls the (batch, step) grid at trace time, so CPU tests
use SHORT synthetic schedules to validate the kernel logic; full-length
runs are validated on real TPU hardware by tpu_validate.py (grid executes
natively there).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairing_tpu.fields import fp as F
from pairing_tpu.fields import fp2 as F2
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.ops import dispatch
from pairing_tpu.ops.fq12_kernels import from_kernel_layout, to_kernel_layout
from pairing_tpu.ops.fused_kernels import miller_f_pallas, pow_ladder_pallas
from pairing_tpu.utils import bn254 as c
from pairing_tpu.utils.bn254 import P

RNG = random.Random(777)


def cyclotomic_element():
    g1 = o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR))
    g2 = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
    return o.easy_part(o.miller_loop(g2, g1))


@pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in __import__("os").environ,
    reason="interpret mode unrolls the grid; slow on CPU (set PAIRING_SLOW_TESTS=1)",
)
def test_pow_ladder_kernel_short():
    # digits [1, -1, 0, 1] => e = ((((1)*2+1... ladder: start m, then per
    # digit d: res = res^2 * m^d  => e = 2^4 + 2^3*1... compute directly:
    digits = [1, -1, 0, 1]
    e = 1
    for d in digits:
        e = 2 * e + d
    m_int = cyclotomic_element()
    m = F12.fq12_from_int_coeffs([m_int])
    mc = F12.conjugate(m)

    @jax.jit
    def run(m, mc):
        m_arr, bs, pad = to_kernel_layout(m)
        mc_arr, _, _ = to_kernel_layout(mc)
        out = pow_ladder_pallas(
            m_arr, mc_arr, np.asarray(digits, np.int32), interpret=True
        )
        return from_kernel_layout(out, bs, pad)

    got = run(m, mc)
    assert F12.fq12_to_int_coeffs(got) == [o.pow_fq12(m_int, e)]


@pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in __import__("os").environ,
    reason="interpret mode unrolls the grid; slow on CPU (set PAIRING_SLOW_TESTS=1)",
)
def test_miller_f_kernel_short_vs_scan():
    """4 synthetic steps with random lines: kernel == reference recurrence."""
    steps, K = 4, 1
    flags = np.asarray([1, 0, 1, 1], np.int32)

    def rand_fq2():
        return (RNG.randrange(P), RNG.randrange(P))

    tg_int = [[rand_fq2() for _ in range(3)] for _ in range(steps)]
    ch_int = [[rand_fq2() for _ in range(3)] for _ in range(steps)]

    # reference recurrence via the oracle
    f = o.fq12_one()
    for t in range(steps):
        f = o.fq12_mul(f, f)
        sparse_t = [None] * 6
        for slot, v in zip((0, 3, 4), tg_int[t]):
            sparse_t[slot] = v
        f = o.sparse_fp12_multiply(f, sparse_t)
        if flags[t]:
            sparse_c = [None] * 6
            for slot, v in zip((2, 3, 5), ch_int[t]):
                sparse_c[slot] = v
            f = o.sparse_fp12_multiply(f, sparse_c)
    expect = f

    # kernel: build [steps, 6, L, R, 128] line stacks (batch=1 lane padded)
    def build(lines_int):
        comps = []  # [steps][6 comps]
        for t in range(steps):
            row = []
            for v in lines_int[t]:
                row.append(v[0])
                row.append(v[1])
            comps.append(row)
        # Fp limbs for each comp, batch shape [1]
        import numpy as np2

        arr = np2.zeros((steps, 6, F.NLIMBS, 8, 128), np2.int32)
        for t in range(steps):
            for ci in range(6):
                val = comps[t][ci] * F.R_MONT % P
                limbs = F.int_to_limbs(val)
                arr[t, ci, :, 0, 0] = limbs
        return jnp.asarray(arr)

    tg_arr = build(tg_int)
    ch_arr = build(ch_int)

    @jax.jit
    def run(tg_arr, ch_arr):
        return miller_f_pallas(tg_arr, ch_arr, flags, 1, interpret=True)

    out = run(tg_arr, ch_arr)
    got = F12.fq12_to_int_coeffs(from_kernel_layout(out, (1024,), 0))[0]
    assert got == expect

    # collect mode: per-step accumulator stream (witness f_steps) must
    # match the reference recurrence at every step
    expect_steps = []
    f = o.fq12_one()
    for t in range(steps):
        f = o.fq12_mul(f, f)
        sparse_t = [None] * 6
        for slot, v in zip((0, 3, 4), tg_int[t]):
            sparse_t[slot] = v
        f = o.sparse_fp12_multiply(f, sparse_t)
        if flags[t]:
            sparse_c = [None] * 6
            for slot, v in zip((2, 3, 5), ch_int[t]):
                sparse_c[slot] = v
            f = o.sparse_fp12_multiply(f, sparse_c)
        expect_steps.append(f)

    @jax.jit
    def run_collect(tg_arr, ch_arr):
        return miller_f_pallas(tg_arr, ch_arr, flags, 1, interpret=True,
                               collect=True)

    out2, fs = run_collect(tg_arr, ch_arr)
    assert F12.fq12_to_int_coeffs(from_kernel_layout(out2, (1024,), 0))[0] == expect
    for t in range(steps):
        got_t = F12.fq12_to_int_coeffs(from_kernel_layout(fs[t], (1024,), 0))[0]
        assert got_t == expect_steps[t], f"f_steps[{t}] mismatch"


@pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in __import__("os").environ,
    reason="interpret mode unrolls the grid; slow on CPU (set PAIRING_SLOW_TESTS=1)",
)
@pytest.mark.parametrize("n_pairs", [1, 2])
def test_miller_f_kernel_fused_epilogue(n_pairs):
    """flag==2 steps: chord-only multiply, no squaring/tangent — the fused
    Miller epilogue (miller_loop_native.rs:274-280). Cross-pair multiply
    order on an epilogue step is pair-major per step; values are identical
    by commutativity, checked canonically vs the oracle."""
    steps = 3
    flags = np.asarray([1, 0, 2], np.int32)

    def rand_fq2():
        return (RNG.randrange(P), RNG.randrange(P))

    tg_int = [[[rand_fq2() for _ in range(3)] for _ in range(n_pairs)]
              for _ in range(steps)]
    ch_int = [[[rand_fq2() for _ in range(3)] for _ in range(n_pairs)]
              for _ in range(steps)]

    # reference recurrence via the oracle (shared squaring per loop step;
    # epilogue step multiplies chords only)
    f = o.fq12_one()
    for t in range(steps):
        if flags[t] != 2:
            f = o.fq12_mul(f, f)
            for k in range(n_pairs):
                sparse_t = [None] * 6
                for slot, v in zip((0, 3, 4), tg_int[t][k]):
                    sparse_t[slot] = v
                f = o.sparse_fp12_multiply(f, sparse_t)
        if flags[t] != 0:
            for k in range(n_pairs):
                sparse_c = [None] * 6
                for slot, v in zip((2, 3, 5), ch_int[t][k]):
                    sparse_c[slot] = v
                f = o.sparse_fp12_multiply(f, sparse_c)
    expect = f

    def build(lines_int):
        arr = np.zeros((steps, n_pairs * 6, F.NLIMBS, 8, 128), np.int32)
        for t in range(steps):
            for k in range(n_pairs):
                for j in range(3):
                    for cc in range(2):
                        val = lines_int[t][k][j][cc] * F.R_MONT % P
                        arr[t, 6 * k + 2 * j + cc, :, 0, 0] = F.int_to_limbs(val)
        return jnp.asarray(arr)

    tg_arr = build(tg_int)
    ch_arr = build(ch_int)

    @jax.jit
    def run(tg_arr, ch_arr):
        return miller_f_pallas(tg_arr, ch_arr, flags, n_pairs, interpret=True)

    out = run(tg_arr, ch_arr)
    got = F12.fq12_to_int_coeffs(from_kernel_layout(out, (1024,), 0))[0]
    assert got == expect


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="full-length kernels need TPU"
)
def test_pairing_pallas_backend_bit_exact_tpu():
    from pairing_tpu.curves import g1 as G1m
    from pairing_tpu.curves import g2 as G2m
    from pairing_tpu.pairing import api

    g1p = o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR))
    g2p = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
    p = G1m.g1_from_ints([g1p])
    q = G2m.g2_from_ints([g2p])
    dispatch.force_backend("pallas")
    try:
        e = jax.jit(api.pairing)(p, q)
    finally:
        dispatch.force_backend(None)
    assert F12.fq12_to_int_coeffs(e) == [o.pairing(g1p, g2p)]


@pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in __import__("os").environ,
    reason="interpret mode unrolls the grid; slow on CPU (set PAIRING_SLOW_TESTS=1)",
)
def test_pow_ladder_w4_kernel_short():
    """Windowed (w=4 NAF) ladder vs the oracle on a short exponent that
    exercises every table entry and both signs."""
    from pairing_tpu.ops.fused_kernels import _wnaf_msb, pow_ladder_w4_pallas
    from pairing_tpu.utils.bn254 import get_wnaf

    # e whose w-NAF covers every table entry {1,3,5,7} and a negative digit
    e = 0x23B53
    digits = _wnaf_msb(e, 4)
    assert set(abs(int(d)) for d in digits if d) == {1, 3, 5, 7}
    assert any(int(d) < 0 for d in digits)
    v = 0
    for d in digits:
        v = 2 * v + int(d)
    assert v == e
    m_int = cyclotomic_element()
    m = F12.fq12_from_int_coeffs([m_int])

    @jax.jit
    def run(m):
        m_arr, bs, pad = to_kernel_layout(m)
        out = pow_ladder_w4_pallas(m_arr, digits, interpret=True)
        return from_kernel_layout(out, bs, pad)

    got = run(m)
    assert F12.fq12_to_int_coeffs(got) == [o.pow_fq12(m_int, e)]


def test_hard_chain_program_schedule():
    """Validate HARD_CHAIN_PROG (the fused chain kernel's register
    schedule: opcode choice, register allocation, alias discipline)
    against the oracle hard part — value-level, instant on CPU. The
    kernel body executing it is hardware-validated by tpu_validate
    (full pairing runs through hard_chain_pallas on TPU)."""
    from pairing_tpu.ops.fused_kernels import (
        HARD_CHAIN_NREG,
        HARD_CHAIN_OUT,
        HARD_CHAIN_PROG,
        OPC_CONJ,
        OPC_CYC,
        OPC_F1,
        OPC_F2,
        OPC_F3,
        OPC_MUL,
    )

    m = cyclotomic_element()
    mx = o.pow_fq12(m, c.BN_X)
    mx2 = o.pow_fq12(mx, c.BN_X)
    mx3 = o.pow_fq12(mx2, c.BN_X)

    regs = [None] * HARD_CHAIN_NREG
    regs[0], regs[1], regs[2], regs[3] = m, mx, mx2, mx3
    for op, dst, a, b in HARD_CHAIN_PROG:
        if op == OPC_MUL:
            assert dst != a and dst != b, "MUL output aliases an input"
            regs[dst] = o.fq12_mul(regs[a], regs[b])
        elif op == OPC_CYC:
            assert dst != a, "CYC output aliases its input"
            regs[dst] = o.fq12_mul(regs[a], regs[a])
        elif op == OPC_CONJ:
            regs[dst] = o.fq12_conj(regs[a])
        elif op in (OPC_F1, OPC_F2, OPC_F3):
            pw = {OPC_F1: 1, OPC_F2: 2, OPC_F3: 3}[op]
            regs[dst] = o.frobenius_map(regs[a], pw)
        else:
            raise AssertionError(f"unknown opcode {op}")

    # expected: the reference hard-part chain (final_exp_native.rs:130-169)
    mul, conj, frob = o.fq12_mul, o.fq12_conj, o.frobenius_map
    sq = lambda v: o.fq12_mul(v, v)
    y0 = mul(frob(m, 1), mul(frob(m, 2), frob(m, 3)))
    y1 = conj(m)
    y2 = frob(mx2, 2)
    y3 = conj(frob(mx, 1))
    y4 = conj(mul(mx, frob(mx2, 1)))
    y5 = conj(mx2)
    y6 = conj(mul(mx3, frob(mx3, 1)))
    t0 = mul(mul(sq(y6), y4), y5)
    t1 = mul(mul(y3, y5), t0)
    t0 = mul(y2, t0)
    t1 = mul(sq(t1), t0)
    t1v = sq(t1)
    expect = mul(sq(mul(t1v, y1)), mul(t1v, y0))
    assert regs[HARD_CHAIN_OUT] == expect


@pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in __import__("os").environ,
    reason="interpret mode unrolls the grid; slow on CPU (set PAIRING_SLOW_TESTS=1)",
)
def test_exp_bits_ladder_short():
    """Interpret-mode smoke of the witness exp-offload bit ladder
    (exp_bits_ladder_pallas) on a 5-bit exponent: out and every streamed
    AIR row must match the oracle bit recurrence (full 64-bit schedule is
    hardware-validated by tpu_validate's witness check)."""
    from pairing_tpu.ops.fused_kernels import exp_bits_ladder_pallas

    m = cyclotomic_element()
    bits = [1, 0, 1, 1, 0]  # MSB first, e = 22
    a = F12.fq12_from_int_coeffs([m])
    arr, bs, pad = to_kernel_layout(a)
    out, rows = exp_bits_ladder_pallas(arr, bits, interpret=True)

    res = o.fq12_one()
    for i, b in enumerate(bits):
        res = o.fq12_mul(res, res)
        if b:
            res = o.fq12_mul(res, m)
        got = F12.fq12_to_int_coeffs(from_kernel_layout(rows[i], bs, pad))[0]
        assert got == res, f"ladder row {i} mismatch"
    assert F12.fq12_to_int_coeffs(from_kernel_layout(out, bs, pad))[0] == res
    assert res == o.pow_fq12(m, 22)
