"""Kernel-layout-resident Fq12 operations.

Round-1 profiling showed the pairing's device time was dominated not by
kernel compute (~30 ms / 2048 lanes total) but by XLA glue: every
``dispatch.fq12_mul`` paid a ``to_kernel_layout``/``from_kernel_layout``
transpose pair, and conjugate/Frobenius/cyclotomic squarings ran as XLA
op-chains between kernels. This module keeps the whole final-exp (and the
Miller epilogue) resident in the kernel layout:

    KF12 = int32[12, NLIMBS, R, 128]     (component-major, batch tiled)

with component index ``2*slot + {c0,c1}`` of the coefficient basis
(SURVEY.md §2.2), limbs settled, values < 2p (the standard envelope).

Ops (all value-identical to the ``fields.fp12`` XLA path):
  * kmul / kmul_sparse  — dense and 034/235 products (existing kernel)
  * kcyc_sq             — Granger-Scott cyclotomic squaring kernel
  * kconj               — conjugate_fp12 (negate odd w-powers;
                          final_exp_native.rs:171-181)
  * kfrob               — frobenius_map (final_exp_native.rs:17-54)
  * kinv                — tower inversion via the fq2_vm programs
  * kpow_x              — x-power cyclotomic ladder (pow_native parity)

The VM layout [n, 2, NLIMBS, R, 128] and KF12 are reshape-compatible
(pure metadata), so chaining VM programs and Fq12 kernels costs nothing.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import fp as F
from ..fields.fp import NLIMBS, R_MOD_P, _const_limbs
from ..utils.bn254 import P, frob_coeff_pow
from . import kernel_core as K
from .fq12_kernels import (
    _pallas_mul,
    from_kernel_layout,
    on_tpu,
    to_kernel_layout,
)
from .jit_cache import cached_jit

DENSE = tuple(range(6))


def _interp(interpret):
    return (not on_tpu()) if interpret is None else interpret


# ---------------------------------------------------------------------------
# Multiplication (wraps the existing kernel-layout-native kernel)
# ---------------------------------------------------------------------------


def kmul(a: jnp.ndarray, b: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Dense Fq12 product, KF12 x KF12 -> KF12."""
    itp = _interp(interpret)
    return cached_jit(
        ("kmul", itp), lambda: lambda a, b: _pallas_mul(DENSE, a, b, itp)
    )(a, b)


def ksq(a: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Dense Fq12 square via the specialized 42-wide-mul kernel."""
    from .fq12_kernels import _pallas_sq

    itp = _interp(interpret)
    return cached_jit(
        ("ksq", itp), lambda: lambda a: _pallas_sq(a, itp)
    )(a)


def kmul_sparse(
    a: jnp.ndarray, present: Tuple[int, ...], b: jnp.ndarray, interpret=None
) -> jnp.ndarray:
    """Sparse product; ``b`` is KF12 whose non-``present`` rows are ignored
    (sparse_fp12_multiply parity, miller_loop_native.rs:46-96)."""
    pres = tuple(sorted(present))
    itp = _interp(interpret)
    return cached_jit(
        ("kmul_sparse", pres, itp),
        lambda: lambda a, b: _pallas_mul(pres, a, b, itp),
    )(a, b)


# ---------------------------------------------------------------------------
# Cyclotomic squaring kernel
# ---------------------------------------------------------------------------


def _cyc_kernel(x_ref, out_ref):
    slots_in = [
        (
            [x_ref[2 * i, l] for l in range(NLIMBS)],
            [x_ref[2 * i + 1, l] for l in range(NLIMBS)],
        )
        for i in range(6)
    ]
    sq = K.k_cyc_sq(slots_in)
    for i in range(6):
        for l in range(NLIMBS):
            out_ref[2 * i, l] = sq[i][0][l]
            out_ref[2 * i + 1, l] = sq[i][1][l]


def _kcyc_sq_impl(a: jnp.ndarray, itp: bool) -> jnp.ndarray:
    nrows = a.shape[2]
    assert nrows % 8 == 0
    blk = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt: (0, 0, bt, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _cyc_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        grid=(nrows // 8,),
        in_specs=[blk],
        out_specs=blk,
        interpret=itp,
    )(a)


def kcyc_sq(a: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Granger-Scott squaring (fields.fp12.fq12_cyclotomic_sq parity);
    valid on the cyclotomic subgroup only."""
    itp = _interp(interpret)
    return cached_jit(
        ("kcyc_sq", itp), lambda: lambda a: _kcyc_sq_impl(a, itp)
    )(a)


# ---------------------------------------------------------------------------
# Slotwise linear maps: conjugate and Frobenius
# ---------------------------------------------------------------------------

# A slot program entry is (neg_c0, neg_c1, const) with const either None
# (identity) or Montgomery limb tuples (g0, g1, ng1) of the slot constant.


@lru_cache(maxsize=None)
def _conj_prog():
    """conjugate_fp12: negate slots of odd w-power (both components)."""
    return tuple((i % 2 == 1, i % 2 == 1, None) for i in range(6))


@lru_cache(maxsize=None)
def _frob_prog(pw: int):
    """frobenius_map(pw): conj each slot's Fq2 (odd pw), then multiply slot
    i by frob_coeffs(pw)^i (final_exp_native.rs:17-54)."""
    prog = []
    for i in range(6):
        g0, g1 = frob_coeff_pow(pw, i)
        if (g0, g1) == (1, 0):
            const = None
        else:
            gm = lambda v: tuple(
                int(x) for x in _const_limbs((v % P) * F.R_MONT % P)
            )
            const = (gm(g0), gm(g1), gm(-g1))
        prog.append((False, pw % 2 == 1, const))
    return tuple(prog)


def _slot_kernel(prog, x_ref, out_ref):
    for i, (neg_c0, neg_c1, const) in enumerate(prog):
        c0 = [x_ref[2 * i, l] for l in range(NLIMBS)]
        c1 = [x_ref[2 * i + 1, l] for l in range(NLIMBS)]
        if neg_c0:
            c0 = K.k_neg_2p(c0)
        if neg_c1:
            c1 = K.k_neg_2p(c1)
        if const is not None:
            g0, g1, ng1 = const
            # (c0 + c1 u)(g0 + g1 u) = (c0 g0 + c1 (-g1)) + (c0 g1 + c1 g0) u
            def cmul(x, climbs):
                return K.k_carry(K.k_pad(K.k_mul_const(x, climbs, K.WIDE), K.WIDE), 3)

            w0 = [p + q for p, q in zip(cmul(c0, g0), cmul(c1, ng1))]
            w1 = [p + q for p, q in zip(cmul(c0, g1), cmul(c1, g0))]
            c0 = K.k_mont_reduce(w0, limb_bound=2 * F.SETTLED)
            c1 = K.k_mont_reduce(w1, limb_bound=2 * F.SETTLED)
        for l in range(NLIMBS):
            out_ref[2 * i, l] = c0[l]
            out_ref[2 * i + 1, l] = c1[l]


def _slotwise(a: jnp.ndarray, prog, interpret) -> jnp.ndarray:
    nrows = a.shape[2]
    assert nrows % 8 == 0
    blk = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt: (0, 0, bt, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_slot_kernel, prog),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        grid=(nrows // 8,),
        in_specs=[blk],
        out_specs=blk,
        interpret=_interp(interpret),
    )(a)


def kconj(a: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """conjugate_fp12; the inverse on the cyclotomic subgroup."""
    itp = _interp(interpret)
    return cached_jit(
        ("kconj", itp), lambda: lambda a: _slotwise(a, _conj_prog(), itp)
    )(a)


def kfrob(a: jnp.ndarray, power: int, interpret=None) -> jnp.ndarray:
    pw = power % 12
    itp = _interp(interpret)
    return cached_jit(
        ("kfrob", pw, itp), lambda: lambda a: _slotwise(a, _frob_prog(pw), itp)
    )(a)


# ---------------------------------------------------------------------------
# Inversion (fq2_vm programs, reshape-only chaining)
# ---------------------------------------------------------------------------


def kinv(a: jnp.ndarray) -> jnp.ndarray:
    """Tower inversion, KF12 -> KF12 (fields.fp12.fq12_inv parity).

    Parts 1/2 run as fq2_vm programs directly on the kernel layout; only
    the single Fq2 norm makes a (tiny) XLA round-trip for the Fermat
    ladder inside F2.inv.
    """
    return cached_jit(("kinv",), lambda: _kinv_impl)(a)


def _kinv_impl(a: jnp.ndarray) -> jnp.ndarray:
    from ..fields import fp2 as F2
    from .inv_kernels import _part1, _part2
    from .fq2_vm import vm_apply, vm_to_fp2s, fp2s_to_vm

    nrows = a.shape[2]
    x_vm = a.reshape(6, 2, NLIMBS, nrows, 128)
    prog1, outs1, nreg1 = _part1()
    part1 = vm_apply(prog1, x_vm, outs1, nreg1)
    # Fermat-invert the Fq6 norm (one Fq2 element; small round-trip).
    (norm,) = vm_to_fp2s(part1[:1], (nrows * 128,), 0)
    ninv = F2.cap(F2.inv(norm))
    ninv_vm, _, _ = fp2s_to_vm([ninv])
    zero_vm = jnp.zeros_like(ninv_vm)
    in2 = jnp.concatenate([x_vm, part1[1:4], ninv_vm, zero_vm], axis=0)
    prog2, outs2, nreg2 = _part2()
    out = vm_apply(prog2, in2, outs2, nreg2)
    return out.reshape(12, NLIMBS, nrows, 128)


# ---------------------------------------------------------------------------
# Cyclotomic x-power ladder
# ---------------------------------------------------------------------------


def kpow_x(m: jnp.ndarray) -> jnp.ndarray:
    """m^BN_X on the cyclotomic subgroup (the batched analogue of the
    reference's STARK exp offload; final_exp_native.rs:56-84).

    Called 3x per final exp — the cached jit traces the ladder body once
    per process. Runs the streamed width-4 NAF ladder: the signed table
    entries are precomputed with the klayout kernels and the ladder
    kernel fetches each multiply step's operand via a scalar-prefetched
    block index, keeping kernel VMEM to two f buffers (the in-kernel
    table variant held a 4 MB table + select chains in the ~16 MB/core
    budget)."""
    from .fused_kernels import pow_x_streamed

    return cached_jit(
        ("kpow_x_stream",), lambda: pow_x_streamed
    )(m)


# ---------------------------------------------------------------------------
# XLA <-> kernel layout bridges for sparse (line) operands
# ---------------------------------------------------------------------------


def sparse_to_k(slots: Dict[int, "object"], nrows: int) -> jnp.ndarray:
    """{slot: Fp2 batch[...]} -> KF12 with zeros in absent rows.

    Used for the Miller epilogue lines; the absent rows are never read by
    kmul_sparse's term tables.
    """
    comps = []
    zero = None
    for i in range(6):
        if i in slots:
            s = slots[i]
            c0 = F._cap_2p(s.c0).limbs
            c1 = F._cap_2p(s.c1).limbs
        else:
            if zero is None:
                any_s = next(iter(slots.values()))
                zero = jnp.zeros_like(any_s.c0.limbs)
            c0 = c1 = zero
        comps += [c0, c1]
    arr = jnp.stack(comps)  # [12, ..., L]
    flat = arr.reshape(12, -1, NLIMBS)
    b = flat.shape[1]
    need = nrows * 128
    assert b <= need
    if b < need:
        flat = jnp.pad(flat, ((0, 0), (0, need - b), (0, 0)))
    return jnp.moveaxis(flat, -1, 1).reshape(12, NLIMBS, nrows, 128)
