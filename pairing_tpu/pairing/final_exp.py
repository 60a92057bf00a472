"""Batched final exponentiation f -> f^((p^12-1)/r).

Algorithm parity: final_exp_native (/root/reference/src/final_exp_native.rs):
  - easy part  (:195-206): f^((q^6-1)(q^2+1)) via conjugate / divide /
    Frobenius^2 / multiply;
  - hard part  (:130-169): the halo2-lib addition chain with three
    x-power exponentiations;
  - pow ladder (:56-84): NAF square-and-multiply. The reference implements
    digit -1 as a full Fq12 division; we multiply by the conjugate instead,
    which is the exact same value because pow is only ever applied inside
    the cyclotomic subgroup (post-easy-part, where conj == inverse) —
    see SURVEY.md §3.5.

TPU-first notes: the x-power ladder runs as a lax.scan over the static NAF
digit array with branchless operand select (one / m / conj(m)), so the
graph stays O(1) in the 63 ladder steps. This is also the batched analogue
of the reference's STARK exp offload shape (C12): one fused ladder kernel
evaluated for many inputs at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bn254 import BN_X_NAF
from ..fields import fp2 as F2
from ..fields import fp12 as F12
from ..fields.fp12 import Fq12
from .miller_loop import _fq12_from_limbs, _fq12_to_limbs, fq12_cap


def pow_x_cyclotomic(m: Fq12) -> Fq12:
    """m^BN_X for m in the cyclotomic subgroup (NAF ladder, conj for -1).

    On TPU this runs as one fused Pallas kernel (the batched analogue of
    the reference's STARK exp offload, SURVEY.md §3.2)."""
    from ..ops import dispatch

    m = fq12_cap(m)
    if dispatch.use_pallas():
        from ..ops.fq12_kernels import from_kernel_layout, to_kernel_layout
        from ..ops.fused_kernels import BN_X_W4_DIGITS, pow_ladder_w4_pallas

        m_arr, bs, pad = to_kernel_layout(m)
        out = pow_ladder_w4_pallas(m_arr, BN_X_W4_DIGITS)
        return from_kernel_layout(out, bs, pad)
    m_conj = fq12_cap(F12.conjugate(m))
    one = fq12_cap(F12.fq12_one(m.batch_shape))
    digits = np.asarray(list(reversed(BN_X_NAF)), dtype=np.int32)
    assert digits[0] == 1
    inner = m.batch_shape

    def body(res_l, digit):
        res = _fq12_from_limbs(res_l)
        res = F12.fq12_cyclotomic_sq(res)
        mult = F12.fq12_select(jnp.broadcast_to(digit == 1, inner), m, one)
        mult = F12.fq12_select(
            jnp.broadcast_to(digit == -1, inner), m_conj, mult
        )
        res = F12.fq12_mul(res, mult)
        return _fq12_to_limbs(fq12_cap(res)), None

    res_l, _ = jax.lax.scan(
        body, _fq12_to_limbs(m), jnp.asarray(digits[1:])
    )
    return _fq12_from_limbs(res_l)


def fq12_pow(a: Fq12, e: int) -> Fq12:
    """General static-exponent Fq12 power (pow_native parity,
    final_exp_native.rs:56-84, for arbitrary elements — no cyclotomic
    assumption, so NAF -1 digits use a true inverse).

    Runs as a lax.scan over the static NAF digits with branchless operand
    select (one / a / a^-1), keeping the graph O(1) in |NAF(e)| like the
    rest of the stack (the inverse is hoisted and computed once, only
    when the NAF actually contains a -1 digit)."""
    assert e >= 1
    from ..fields.fp12 import fq12_inv
    from ..utils.bn254 import get_naf

    naf = list(reversed(get_naf(e)))
    assert naf[0] == 1
    a = fq12_cap(a)
    if len(naf) == 1:
        return a
    digits = np.asarray(naf[1:], dtype=np.int32)
    # a^-1 feeds the scan only for -1 digits; when NAF(e) has none, pass
    # `a` as an unused placeholder instead of paying the inversion chain.
    a_inv = fq12_cap(fq12_inv(a)) if bool((digits == -1).any()) else a
    one = fq12_cap(F12.fq12_one(a.batch_shape))
    inner = a.batch_shape

    def body(res_l, digit):
        res = _fq12_from_limbs(res_l)
        res = F12.fq12_sq(res)
        mult = F12.fq12_select(jnp.broadcast_to(digit == 1, inner), a, one)
        mult = F12.fq12_select(
            jnp.broadcast_to(digit == -1, inner), a_inv, mult
        )
        res = F12.fq12_mul(res, mult)
        return _fq12_to_limbs(fq12_cap(res)), None

    res_l, _ = jax.lax.scan(body, _fq12_to_limbs(a), jnp.asarray(digits))
    return _fq12_from_limbs(res_l)


def easy_part_k(a):
    """Kernel-layout easy part: a -> a^((q^6-1)(q^2+1))
    (final_exp_native.rs:195-206). KF12 in/out, fully kernel-resident."""
    from ..ops import klayout as KL

    f1 = KL.kconj(a)
    f2 = KL.kmul(f1, KL.kinv(a))
    f3 = KL.kfrob(f2, 2)
    return KL.kmul(f3, f2)


def hard_part_k(m):
    """Kernel-layout halo2-lib addition chain (final_exp_native.rs:130-169).
    KF12 in/out; every op is a Pallas kernel on the kernel layout — no
    transposes between ops (the round-1 bottleneck)."""
    from ..ops import klayout as KL

    mx = KL.kpow_x(m)
    mx2 = KL.kpow_x(mx)
    mx3 = KL.kpow_x(mx2)
    return hard_part_chain_k(m, mx, mx2, mx3)


def hard_part_chain_k(m, mx, mx2, mx3):
    """The hard-part accumulation chain given the three x-powers
    (final_exp_native.rs:130-169 with mx/mx2/mx3 precomputed — the shape
    the circuit side uses after the exp offload, final_exp_target.rs:
    65-150). KF12 in/out.

    Default path: launch-per-op klayout chain. The ONE-kernel fused
    register-file variant (ops/fused_kernels.hard_chain_pallas, ~28
    launches' HBM round trips saved) measured ~6% SLOWER end-to-end
    (batch 16384, pipelined: 0.266 s/batch fused vs 0.250 s unfused,
    round 5): at this batch size the per-launch HBM traffic overlaps
    with compute across kernels, while the fused kernel serializes the
    whole chain through one VMEM register file. Kept behind
    PAIRING_FUSED_CHAIN=1 as a measured-negative probe (bit-exact on
    hardware — tpu_validate passed with it as the default)."""
    import os

    from ..ops import klayout as KL
    from ..ops.fq12_kernels import on_tpu

    if on_tpu() and os.environ.get("PAIRING_FUSED_CHAIN"):
        from ..ops.fused_kernels import hard_chain_pallas

        return hard_chain_pallas(m, mx, mx2, mx3)

    mul, conj, frob, csq = KL.kmul, KL.kconj, KL.kfrob, KL.kcyc_sq

    mp = frob(m, 1)
    mp2 = frob(m, 2)
    mp3 = frob(m, 3)

    y0 = mul(mp, mul(mp2, mp3))
    y1 = conj(m)
    mxp = frob(mx, 1)
    mx2p = frob(mx2, 1)
    y2 = frob(mx2, 2)
    y5 = conj(mx2)
    mx3p = frob(mx3, 1)

    y3 = conj(mxp)
    y4 = conj(mul(mx, mx2p))
    y6 = conj(mul(mx3, mx3p))

    t0 = mul(mul(csq(y6), y4), y5)
    t1 = mul(y3, y5)
    t1 = mul(t1, t0)
    t0 = mul(y2, t0)
    t1 = csq(t1)
    t1 = mul(t1, t0)
    t1 = csq(t1)
    t0 = mul(t1, y1)
    t1 = mul(t1, y0)
    t0 = csq(t0)
    t0 = mul(t0, t1)
    return t0


def final_exp_k(a):
    """Kernel-layout final exponentiation (final_exp_native.rs:209-213)."""
    return hard_part_k(easy_part_k(a))


def easy_part(a: Fq12) -> Fq12:
    """a -> a^((q^6-1)(q^2+1)) (final_exp_native.rs:195-206)."""
    from ..ops import dispatch

    f1 = F12.conjugate(a)
    if dispatch.use_pallas():
        from ..ops.inv_kernels import fq12_inv_pallas

        f2 = dispatch.fq12_mul(f1, fq12_inv_pallas(a))
    else:
        f2 = F12.fq12_div(f1, a)
    f3 = F12.frobenius_map(f2, 2)
    return dispatch.fq12_mul(f3, f2)


def hard_part(m: Fq12) -> Fq12:
    """halo2-lib addition chain (final_exp_native.rs:130-169)."""
    from ..ops import dispatch

    mul, conj, frob = dispatch.fq12_mul, F12.conjugate, F12.frobenius_map

    mp = frob(m, 1)
    mp2 = frob(m, 2)
    mp3 = frob(m, 3)

    y0 = mul(mp, mul(mp2, mp3))
    y1 = conj(m)
    mx = pow_x_cyclotomic(m)
    mxp = frob(mx, 1)
    mx2 = pow_x_cyclotomic(mx)
    mx2p = frob(mx2, 1)
    y2 = frob(mx2, 2)
    y5 = conj(mx2)
    mx3 = pow_x_cyclotomic(mx2)
    mx3p = frob(mx3, 1)

    y3 = conj(mxp)
    y4 = conj(mul(mx, mx2p))
    y6 = conj(mul(mx3, mx3p))

    # all operands below live in the cyclotomic subgroup (products of
    # powers/Frobenius images of the easy-part output), so squarings use
    # the Granger-Scott formulas — value-identical, ~8x cheaper.
    csq = F12.fq12_cyclotomic_sq
    t0 = mul(mul(csq(y6), y4), y5)
    t1 = mul(y3, y5)
    t1 = mul(t1, t0)
    t0 = mul(y2, t0)
    t1 = csq(t1)
    t1 = mul(t1, t0)
    t1 = csq(t1)
    t0 = mul(t1, y1)
    t1 = mul(t1, y0)
    t0 = csq(t0)
    t0 = mul(t0, t1)
    return t0


def final_exp(a: Fq12) -> Fq12:
    """final_exp_native (final_exp_native.rs:209-213)."""
    from ..ops import dispatch

    if dispatch.use_pallas():
        from ..ops.fq12_kernels import from_kernel_layout, to_kernel_layout

        arr, bs, pad = to_kernel_layout(a)
        return from_kernel_layout(final_exp_k(arr), bs, pad)
    return hard_part(easy_part(a))
