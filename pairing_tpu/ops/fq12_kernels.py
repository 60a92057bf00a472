"""Pallas TPU kernels for batched Fq12 multiplication.

The hot op of the pairing (SURVEY.md §2.2): dense and 034/235-sparse
coefficient-basis products. One kernel invocation processes the whole
batch, tiled 1024 lanes (8x128 VPU tiles) per grid step; limbs live in
registers/VMEM with all limb loops unrolled at trace time.

Same term-table decomposition as fields.fp12._mul_gathered (12 output
accumulators, xi-fold absorbed into premultiplied LHS vocabulary), but the
accumulation runs segment-at-a-time inside the kernel so every store is
statically indexed.

Layout: ``[12, NLIMBS, B//128, 128]`` int32 ("kernel layout"), batch padded
to a multiple of 1024. Conversion helpers bridge the XLA-layer Fq12.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import fp as F
from ..fields import fp12 as F12
from ..fields.fp import Fp, NLIMBS, SETTLED
from ..fields.fp2 import Fp2
from ..fields.fp12 import Fq12
from ..utils.bn254 import P
from . import kernel_core as K

LANES = 1024  # 8 x 128 per grid step


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# v2 cores: unordered-pair + Fq2-Karatsuba decomposition
# ---------------------------------------------------------------------------
#
# The schoolbook segment core above costs 4 wide muls per Fq2 slot product
# (144 for dense, 72 for 3-slot sparse). The v2 cores cut the wide-mul
# count with two standard identities, made int32-safe by the KW signed
# accumulator layer (ops/kwide):
#
#   * Fq2 Karatsuba:            slot product = 3 wide muls
#   * unordered pairs (dense):  Ai*Bj + Aj*Bi = (Ai+Aj)(Bi+Bj) - Di - Dj
#     with the 6 diagonals Di shared across all 15 pairs
#
# Counts: dense square 42 muls (21 Fq2 squarings x 2), dense mul 63
# (21 Fq2 Karatsubas), 3-slot sparse 54 (18 x 3) — vs 144/144/72.
# Algorithm parity: same coefficient-basis product as fields.fp12
# (MyFq12, SURVEY.md §2.2); only the mul tree is reassociated, so results
# stay bit-exact after canonicalization (identical residues mod p).

from . import kwide as W

# unordered slot pairs {i,j}, i<j, grouped by output slot (i+j) mod 6
_PAIRS = [(i, j) for i in range(6) for j in range(i + 1, 6)]


def _k2_read(get, i: int, bound: int = 2 * P) -> W.K2:
    return W.K2(
        [get(2 * i, l) for l in range(NLIMBS)],
        [get(2 * i + 1, l) for l in range(NLIMBS)],
        bound,
    )


def _acc_add(acc, s: int, hi: bool, term):
    if hi:
        term = W.kw2_xi(term)
    acc[s] = term if acc[s] is None else W.kw2_add(acc[s], term)


def _acc_flush(acc, out_set):
    for s in range(6):
        c0, c1 = W.kw2_finalize(acc[s])
        out_set(2 * s, c0)
        out_set(2 * s + 1, c1)


def _sq_core_v2(a_get, out_set):
    """Dense Fq12 square: 42 wide muls."""
    A = [_k2_read(a_get, i) for i in range(6)]
    D = [W.k2w_sq(A[i]) for i in range(6)]
    acc = [None] * 6
    for i in range(6):
        _acc_add(acc, (2 * i) % 6, 2 * i >= 6, D[i])
    for i, j in _PAIRS:
        Pij = W.k2w_sq(W.k2_sum(A[i], A[j]))
        cross = W.kw2_sub(W.kw2_sub(Pij, D[i]), D[j])
        _acc_add(acc, (i + j) % 6, i + j >= 6, cross)
    _acc_flush(acc, out_set)


def _mul_core_v2(a_get, b_get, out_set):
    """Dense Fq12 product: 63 wide muls."""
    A = [_k2_read(a_get, i) for i in range(6)]
    B = [_k2_read(b_get, i) for i in range(6)]
    D = [W.k2w_mul(A[i], B[i]) for i in range(6)]
    acc = [None] * 6
    for i in range(6):
        _acc_add(acc, (2 * i) % 6, 2 * i >= 6, D[i])
    for i, j in _PAIRS:
        Pij = W.k2w_mul(W.k2_sum(A[i], A[j]), W.k2_sum(B[i], B[j]))
        cross = W.kw2_sub(W.kw2_sub(Pij, D[i]), D[j])
        _acc_add(acc, (i + j) % 6, i + j >= 6, cross)
    _acc_flush(acc, out_set)


# ---------------------------------------------------------------------------
# v3 dense cores: two-level Karatsuba (Fq6[w^3] split over 3x3 blocks)
# ---------------------------------------------------------------------------
#
# Split a = aL + aH w^3 (slot halves); with w^6 = xi:
#   a*b = M0 + (M2 - M0 - M1) w^3 + xi*M1,   M2 = (aL+aH)(bL+bH)
# Each 3x3 block runs the unordered-pair trick (3 diagonals + 3 pair
# crosses = 6 Fq2 Karatsubas = 18 wide muls), so the dense mul costs
# 54 wide muls (v2: 63) and the dense square 36 (v2: 42). To avoid
# keeping whole blocks live for the cross subtraction, every block
# position accumulates STRAIGHT into the output slots with its sign:
# M0[p] adds at slot p and subtracts at the w^3 shift; M1[p] adds
# xi-folded and subtracts at the shift; M2[p] adds at the shift only.
# The KW signed layer tracks the negative bounds exactly; residues match
# v2/XLA after canonicalization (identical values mod p).


def _acc_sub(acc, s: int, hi: bool, term):
    _acc_add(acc, s, hi, W.kw2_neg(term))


def _block_mul(As, Bs, dest):
    """3x3 slot-block product: dest(p, KWPair) for positions p = 0..4."""
    D = [W.k2w_mul(As[i], Bs[i]) for i in range(3)]
    dest(0, D[0])
    dest(2, D[1])
    dest(4, D[2])
    for i, j in ((0, 1), (0, 2), (1, 2)):
        Pij = W.k2w_mul(W.k2_sum(As[i], As[j]), W.k2_sum(Bs[i], Bs[j]))
        dest(i + j, W.kw2_sub(W.kw2_sub(Pij, D[i]), D[j]))


def _block_sq(As, dest):
    """3x3 symmetric block square: 12 wide muls."""
    D = [W.k2w_sq(As[i]) for i in range(3)]
    dest(0, D[0])
    dest(2, D[1])
    dest(4, D[2])
    for i, j in ((0, 1), (0, 2), (1, 2)):
        Pij = W.k2w_sq(W.k2_sum(As[i], As[j]))
        dest(i + j, W.kw2_sub(W.kw2_sub(Pij, D[i]), D[j]))


def _v3_dests(acc):
    """The three block destinations of the w^3 Karatsuba recombination."""

    def dest_m0(p, term):
        _acc_add(acc, p, False, term)  # M0 at w^p
        _acc_sub(acc, (p + 3) % 6, p + 3 >= 6, term)  # -M0 at w^(p+3)

    def dest_m1(p, term):
        _acc_add(acc, p, True, term)  # xi*M1 at w^p (the w^6 fold)
        _acc_sub(acc, (p + 3) % 6, p + 3 >= 6, term)  # -M1 at w^(p+3)

    def dest_m2(p, term):
        _acc_add(acc, (p + 3) % 6, p + 3 >= 6, term)  # +M2 at w^(p+3)

    return dest_m0, dest_m1, dest_m2


def _mul_core_v3(a_get, b_get, out_set):
    """Dense Fq12 product: 54 wide muls (two-level Karatsuba)."""
    A = [_k2_read(a_get, i) for i in range(6)]
    B = [_k2_read(b_get, i) for i in range(6)]
    AS = [W.k2_sum(A[i], A[i + 3]) for i in range(3)]
    BS = [W.k2_sum(B[i], B[i + 3]) for i in range(3)]
    acc = [None] * 6
    dest_m0, dest_m1, dest_m2 = _v3_dests(acc)
    _block_mul(A[:3], B[:3], dest_m0)
    _block_mul(A[3:], B[3:], dest_m1)
    _block_mul(AS, BS, dest_m2)
    _acc_flush(acc, out_set)


def _sq_core_v3(a_get, out_set):
    """Dense Fq12 square: 36 wide muls (two-level Karatsuba).

    Production Miller-step square (round 5; round 4 measured it neutral
    against v2 inside relay noise, but the exact tile-op count — see
    core_opcount.py — is 7% lower, and the round-5 slope probe confirms
    the win on hardware). Also the _pallas_sq / _sq_kernel_v2 core."""
    A = [_k2_read(a_get, i) for i in range(6)]
    AS = [W.k2_sum(A[i], A[i + 3]) for i in range(3)]
    acc = [None] * 6
    dest_m0, dest_m1, dest_m2 = _v3_dests(acc)
    _block_sq(A[:3], dest_m0)
    _block_sq(A[3:], dest_m1)
    _block_sq(AS, dest_m2)
    _acc_flush(acc, out_set)


def _sparse_core_v2(present: Tuple[int, ...], a_get, b_slot_get, out_set,
                    b_bound: int = 2 * P):
    """Sparse product (|present| line slots): 3 wide muls per slot pair.

    The unordered-pair sharing doesn't apply across different operand
    vectors with disjoint support, so each (i, j) product is a plain Fq2
    Karatsuba (054/235 line shapes: 54 muls vs 72). ``b_bound``: static
    value bound of the line slots (the lines kernel emits redundant
    representatives above 2p; the KW budget asserts cover it)."""
    A = [_k2_read(a_get, i) for i in range(6)]
    B = [
        W.K2(
            [b_slot_get(jj, 0, l) for l in range(NLIMBS)],
            [b_slot_get(jj, 1, l) for l in range(NLIMBS)],
            b_bound,
        )
        for jj in range(len(present))
    ]
    acc = [None] * 6
    for i in range(6):
        for jj, j in enumerate(present):
            term = W.k2w_mul(A[i], B[jj])
            _acc_add(acc, (i + j) % 6, i + j >= 6, term)
    _acc_flush(acc, out_set)


def _mul_kernel_v2(present, a_ref, b_ref, out_ref):
    def out_set(seg, limbs):
        for l in range(NLIMBS):
            out_ref[seg, l] = limbs[l]

    if len(present) == 6:
        _mul_core_v3(
            lambda c, l: a_ref[c, l], lambda c, l: b_ref[c, l], out_set
        )
    else:
        _sparse_core_v2(
            present,
            lambda c, l: a_ref[c, l],
            lambda jj, cc, l: b_ref[2 * present[jj] + cc, l],
            out_set,
        )


def _sq_kernel_v2(a_ref, out_ref):
    def out_set(seg, limbs):
        for l in range(NLIMBS):
            out_ref[seg, l] = limbs[l]

    _sq_core_v3(lambda c, l: a_ref[c, l], out_set)


_F12_BLOCK = pl.BlockSpec(
    (12, NLIMBS, 8, 128), lambda bt: (0, 0, bt, 0), memory_space=pltpu.VMEM
)


def _pallas_mul(present: Tuple[int, ...], a_arr: jnp.ndarray,
                b_arr: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """a_arr [12, L, R, 128] x b_arr [12, ...] -> [12, L, R, 128]."""
    nrows = a_arr.shape[2]
    assert nrows % 8 == 0
    out = pl.pallas_call(
        partial(_mul_kernel_v2, present),
        out_shape=jax.ShapeDtypeStruct(a_arr.shape, jnp.int32),
        grid=(nrows // 8,),
        in_specs=[_F12_BLOCK, _F12_BLOCK],
        out_specs=_F12_BLOCK,
        interpret=interpret,
    )(a_arr, b_arr)
    return out


def _pallas_sq(a_arr: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Dense Fq12 square kernel (42 wide muls), KF12 -> KF12."""
    nrows = a_arr.shape[2]
    assert nrows % 8 == 0
    out = pl.pallas_call(
        _sq_kernel_v2,
        out_shape=jax.ShapeDtypeStruct(a_arr.shape, jnp.int32),
        grid=(nrows // 8,),
        in_specs=[_F12_BLOCK],
        out_specs=_F12_BLOCK,
        interpret=interpret,
    )(a_arr)
    return out


# ---------------------------------------------------------------------------
# Layout conversion + public API
# ---------------------------------------------------------------------------


def to_kernel_layout(a: Fq12) -> Tuple[jnp.ndarray, Tuple[int, ...], int]:
    """Fq12 (batch [...]) -> ([12, L, R, 128], batch_shape, pad)."""
    from ..pairing.miller_loop import fq12_cap

    a = fq12_cap(a)
    comps = []
    for i in range(6):
        comps.append(a.s[i].c0.limbs)
        comps.append(a.s[i].c1.limbs)
    arr = jnp.stack(comps)  # [12, ..., L]
    batch_shape = arr.shape[1:-1]
    flat = arr.reshape(12, -1, NLIMBS)
    b = flat.shape[1]
    pad = (-b) % LANES
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    n = flat.shape[1]
    out = jnp.moveaxis(flat, -1, 1).reshape(12, NLIMBS, n // 128, 128)
    return out, batch_shape, pad


def from_kernel_layout(arr: jnp.ndarray, batch_shape, pad: int) -> Fq12:
    n = arr.shape[2] * 128
    flat = jnp.moveaxis(arr.reshape(12, NLIMBS, n), 1, -1)  # [12, n, L]
    if pad:
        flat = flat[:, : n - pad]
    full = flat.reshape((12,) + tuple(batch_shape) + (NLIMBS,))
    slots = []
    for i in range(6):
        slots.append(
            Fp2(
                Fp(full[2 * i], 2 * P, SETTLED),
                Fp(full[2 * i + 1], 2 * P, SETTLED),
            )
        )
    return Fq12(tuple(slots))


def fq12_mul_pallas(a: Fq12, b: Fq12, interpret: bool = False) -> Fq12:
    """Dense Fq12 product via the Pallas kernel; value-identical to
    fields.fp12.fq12_mul (same Montgomery envelope)."""
    a_arr, bs, pad = to_kernel_layout(a)
    b_arr, _, _ = to_kernel_layout(b)
    out = _pallas_mul(tuple(range(6)), a_arr, b_arr, interpret)
    return from_kernel_layout(out, bs, pad)


def fq12_mul_sparse_pallas(
    a: Fq12, slots: Dict[int, Fp2], interpret: bool = False
) -> Fq12:
    """Sparse (line) product via the Pallas kernel. ``slots`` maps slot
    index -> Fp2; zero slots are never materialized."""
    present = tuple(sorted(slots.keys()))
    a_arr, bs, pad = to_kernel_layout(a)
    # build a dense-looking b array holding only present slots (other rows
    # never read by the kernel's term tables)
    full = {i: slots.get(i) for i in range(6)}
    zero = None
    comps = []
    for i in range(6):
        if full[i] is None:
            if zero is None:
                any_slot = slots[present[0]]
                zero = Fp2(
                    Fp(jnp.zeros_like(any_slot.c0.limbs), P, 0),
                    Fp(jnp.zeros_like(any_slot.c1.limbs), P, 0),
                )
            full[i] = zero
    b = Fq12(tuple(full[i] for i in range(6)))
    b_arr, _, _ = to_kernel_layout(b)
    out = _pallas_mul(present, a_arr, b_arr, interpret)
    return from_kernel_layout(out, bs, pad)
