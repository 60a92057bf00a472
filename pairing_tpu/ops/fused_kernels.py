"""Fused Pallas kernels: Miller f-accumulation and cyclotomic pow ladders.

These keep the Fq12 accumulator resident in VMEM across all loop steps —
the TPU analogue of the reference's tight native loops — so the only HBM
traffic per step is the streamed line coefficients (Miller) or nothing
(pow). The grid is (batch_tiles, steps); TPU executes grid steps
sequentially per core, so VMEM scratch persists across the step dimension
(standard reduction pattern).

Value parity: identical Montgomery envelope and term tables as the XLA
path (fields.fp12) — outputs are bit-exact interchangeable.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import NLIMBS, R_MOD_P, SETTLED, _const_limbs
from ..utils.bn254 import BN_X, BN_X_NAF
from . import kernel_core as K
from .fq12_kernels import (
    _mul_core_v3,
    _sparse_core_v2,
    _sq_core_v3,
)

DENSE = tuple(range(6))
S034 = (0, 3, 4)
S235 = (2, 3, 5)

ONE_MONT_LIMBS = [int(x) for x in _const_limbs(R_MOD_P)]


def _write_one(f_ref, zero):
    """Store the Montgomery one into an f scratch ref."""
    for c in range(12):
        for l in range(NLIMBS):
            v = ONE_MONT_LIMBS[l] if c == 0 else 0
            f_ref[c, l] = zero + v


def _copy_f(dst, src):
    for c in range(12):
        for l in range(NLIMBS):
            dst[c, l] = src[c, l]


def _ref_get(ref):
    return lambda c, l: ref[c, l]


def _ref_out(ref):
    def out_set(seg, limbs):
        for l in range(NLIMBS):
            ref[seg, l] = limbs[l]

    return out_set


# ---------------------------------------------------------------------------
# Miller f-accumulation kernel
# ---------------------------------------------------------------------------


def _miller_kernel(n_pairs, n_steps, collect, has_ep, line_bound, flag_ref,
                   tg_ref, ch_ref, *refs):
    if has_ep:
        ep_ref, *refs = refs
    else:
        ep_ref = None
    if collect:
        out_ref, fs_ref, fA, fB, fC = refs
    else:
        out_ref, fA, fB, fC = refs
        fs_ref = None
    """Grid (batch_tile, step, pair): ONE shared f^2 per step for any K
    (multi_miller_loop_BN_native's defining amortization,
    miller_loop_native.rs:239), then this pair's tangent/chord sparse
    multiplies. VMEM stays constant in K (per-pair line blocks stream).
    Each (t, kc) invocation starts and ends with the state in fA.

    flag semantics per step: 0 = square + tangent; 1 = square + tangent
    + chord; 2 = epilogue chord only (no squaring, no tangent — the two
    Frobenius-line multiplies, miller_loop_native.rs:274-280, fused in
    as trailing steps so no host-side launches remain).
    """
    t = pl.program_id(1)
    kc = pl.program_id(2)
    zero = tg_ref[0, 0, 0] * 0
    flag = flag_ref[t]

    @pl.when((t == 0) & (kc == 0))
    def _():
        _write_one(fA, zero)

    # kc == 0 on a loop step: f <- f^2 into fB; otherwise carry fA
    @pl.when((kc == 0) & (flag != 2))
    def _():
        _sq_core_v3(_ref_get(fA), _ref_out(fB))

    @pl.when((kc != 0) | (flag == 2))
    def _():
        _copy_f(fB, fA)

    # this pair's tangent multiply (fB -> fC); skipped on epilogue steps
    @pl.when(flag != 2)
    def _():
        _sparse_core_v2(S034, _ref_get(fB),
                        lambda jj, cc, l: tg_ref[0, 2 * jj + cc, l],
                        _ref_out(fC), b_bound=line_bound)

    @pl.when(flag == 2)
    def _():
        _copy_f(fC, fB)

    # chord multiply on digit steps, epilogue-line multiply on flag==2
    # steps (fC -> fA), else carry fC
    @pl.when(flag == 1)
    def _():
        _sparse_core_v2(S235, _ref_get(fC),
                        lambda jj, cc, l: ch_ref[0, 2 * jj + cc, l],
                        _ref_out(fA), b_bound=line_bound)

    if has_ep:

        @pl.when(flag == 2)
        def _():
            _sparse_core_v2(S235, _ref_get(fC),
                            lambda jj, cc, l: ep_ref[0, 2 * jj + cc, l],
                            _ref_out(fA))

    @pl.when(flag == 0)
    def _():
        _copy_f(fA, fC)

    if collect:

        @pl.when(kc == n_pairs - 1)
        def _():
            for c in range(12):
                for l in range(NLIMBS):
                    fs_ref[0, c, l] = fA[c, l]

    @pl.when((t == n_steps - 1) & (kc == n_pairs - 1))
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def miller_f_pallas(tg_arr: jnp.ndarray, ch_arr: jnp.ndarray,
                    flags: np.ndarray, n_pairs: int,
                    interpret=None, collect: bool = False,
                    ep_arr: jnp.ndarray = None,
                    line_bound: int = 0):
    """Run the multi-pair f-accumulation (any K >= 1).

    tg_arr/ch_arr: [steps, n_pairs*6, NLIMBS, R, 128] line stacks
    (kernel layout, pair-major components); flags: int32 [steps]
    (0 = double step, 1 = chord step, 2 = fused epilogue chord-only
    step — see _miller_kernel). Returns f in kernel layout
    [12, NLIMBS, R, 128]; with ``collect`` also the per-step accumulator
    stream [steps, 12, NLIMBS, R, 128] (the witness path's f_steps,
    miller_loop_target.rs:132-311) — production runs keep collect off to
    skip the per-step HBM writeback. ``collect`` composes with the fused
    epilogue: trailing flag==2 rows hold the post-epilogue accumulator
    (row [-1] == the returned f); the Miller-step rows are [:n_loop].

    ``ep_arr``: [n_ep, n_pairs*6, NLIMBS, R, 128] epilogue-line blocks for
    the trailing flag==2 steps (kept as a separate input so the 64-step
    line streams are never copied into a concatenated array; flags entry
    t==2 reads ep block t - n_loop where n_loop = #(flags != 2)).
    """
    from .jit_cache import cached_jit

    n_ep = sum(1 for f in flags if int(f) == 2)
    assert n_ep == 0 or (
        ep_arr is not None
        and ep_arr.shape[0] == n_ep
        and all(int(f) == 2 for f in flags[len(flags) - n_ep:])
    ), "flag==2 steps must trail and match ep_arr rows"

    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    from ..utils.bn254 import P as _P

    line_bound = line_bound or 2 * _P
    key = ("miller_f", tuple(int(x) for x in flags), n_pairs, bool(interpret),
           bool(collect), line_bound)
    args = (tg_arr, ch_arr) if ep_arr is None else (tg_arr, ch_arr, ep_arr)
    return cached_jit(
        key,
        lambda: lambda tg, ch, *ep: _miller_f_impl(tg, ch, flags, n_pairs,
                                                   interpret, collect,
                                                   line_bound, *ep),
    )(*args)


def _miller_f_impl(tg_arr, ch_arr, flags, n_pairs, interpret, collect,
                   line_bound, ep_arr=None):
    n_steps = len(flags)
    n_loop = tg_arr.shape[0]
    assert tg_arr.shape[1] == n_pairs * 6
    nrows = tg_arr.shape[3]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps, n_pairs)
    has_ep = ep_arr is not None

    kern = partial(_miller_kernel, n_pairs, n_steps, collect, has_ep,
                   line_bound)
    # loop-line blocks clamp to the last loop step on epilogue steps (the
    # kernel never reads them there); epilogue blocks index t - n_loop.
    line_block = pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128),
        lambda bt, t, kc: (jnp.minimum(t, n_loop - 1), kc, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    ep_block = pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128),
        lambda bt, t, kc: (
            jnp.clip(t - n_loop, 0, max(n_steps - n_loop - 1, 0)),
            kc, 0, bt, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    f_spec = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t, kc: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((12, NLIMBS, nrows, 128), jnp.int32)
    if collect:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((n_steps, 12, NLIMBS, nrows, 128), jnp.int32),
        )
        out_specs = (
            f_spec,
            pl.BlockSpec(
                (1, 12, NLIMBS, 8, 128), lambda bt, t, kc: (t, 0, 0, bt, 0),
                memory_space=pltpu.VMEM,
            ),
        )
    else:
        out_specs = f_spec
    in_specs = [smem(), line_block, line_block]
    ins = [jnp.asarray(flags, jnp.int32), tg_arr, ch_arr]
    if has_ep:
        in_specs.append(ep_block)
        ins.append(ep_arr)
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(*ins)
    return out


# ---------------------------------------------------------------------------
# Cyclotomic x-power ladder kernel
# ---------------------------------------------------------------------------


def _pow_kernel(n_steps, dig_ref, m_ref, mc_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _copy_f(fA, m_ref)

    # res <- res^2 via Granger-Scott cyclotomic squaring (fA -> fB):
    # the ladder only ever runs on unit-norm elements.
    slots_in = [
        (
            [fA[2 * i, l] for l in range(NLIMBS)],
            [fA[2 * i + 1, l] for l in range(NLIMBS)],
        )
        for i in range(6)
    ]
    sq_slots = K.k_cyc_sq(slots_in)
    for i in range(6):
        for l in range(NLIMBS):
            fB[2 * i, l] = sq_slots[i][0][l]
            fB[2 * i + 1, l] = sq_slots[i][1][l]

    # res <- res * (m or conj m), only on nonzero digits (fB -> fA)
    d = dig_ref[t]

    @pl.when(d != 0)
    def _():
        def b_get(c, l):
            return jnp.where(d == 1, m_ref[c, l], mc_ref[c, l])

        _mul_core_v3(_ref_get(fB), b_get, _ref_out(fA))

    @pl.when(d == 0)
    def _():
        _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def pow_ladder_pallas(m_arr: jnp.ndarray, mc_arr: jnp.ndarray,
                      digits: np.ndarray,
                      interpret=None) -> jnp.ndarray:
    """res = m^e where e is encoded by ``digits`` (MSB-first NAF tail: the
    ladder starts at m, then per digit: square and multiply by
    {m, conj(m), 1}). Kernel layout in/out [12, NLIMBS, R, 128]."""
    from .jit_cache import cached_jit

    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    key = ("pow_ladder", tuple(int(x) for x in digits), bool(interpret))
    return cached_jit(
        key,
        lambda: lambda m, mc: _pow_ladder_impl(m, mc, digits, interpret),
    )(m_arr, mc_arr)


def _pow_ladder_impl(m_arr, mc_arr, digits, interpret):
    n_steps = len(digits)
    nrows = m_arr.shape[2]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    kern = partial(_pow_kernel, n_steps)
    fixed_block = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(m_arr.shape, jnp.int32),
        grid=grid,
        in_specs=[smem(), fixed_block, fixed_block],
        out_specs=fixed_block,
        scratch_shapes=[
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(np.asarray(digits, np.int32)), m_arr, mc_arr)
    return out


#: MSB-first BN_X NAF digits with the leading 1 consumed by ladder init.
BN_X_LADDER_DIGITS = np.asarray(list(reversed(BN_X_NAF))[1:], np.int32)


# ---------------------------------------------------------------------------
# Windowed (w=4 NAF) cyclotomic pow ladder
# ---------------------------------------------------------------------------
#
# Plain NAF pays 23 in-ladder dense multiplies for BN_X; width-4 NAF has
# 14 nonzero digits (table {m, m^3, m^5, m^7}), so the ladder pays
# 13 multiplies + 3 table multiplies + 1 table squaring — ~7 dense Fq12
# muls saved per ladder, 3 ladders per final exp. Digit -d multiplies by
# the conjugate of the table entry (valid: cyclotomic subgroup only).


def _cyc_step(src_get, dst):
    """dst <- Granger-Scott cyclotomic square of src."""
    slots_in = [
        (
            [src_get(2 * i, l) for l in range(NLIMBS)],
            [src_get(2 * i + 1, l) for l in range(NLIMBS)],
        )
        for i in range(6)
    ]
    sq_slots = K.k_cyc_sq(slots_in)
    for i in range(6):
        for l in range(NLIMBS):
            dst[2 * i, l] = sq_slots[i][0][l]
            dst[2 * i + 1, l] = sq_slots[i][1][l]


def _tab_select_get(tab_ref, d):
    """Register-select the table entry for digit d (|d| in {1,3,5,7}),
    conjugated when d < 0 (conjugate_fp12: negate odd-w-power slots)."""
    ad = jnp.abs(d)
    neg = d < 0
    comps = []
    for c in range(12):
        limbs = []
        for l in range(NLIMBS):
            v = tab_ref[0, c, l]
            v = jnp.where(ad == 3, tab_ref[1, c, l], v)
            v = jnp.where(ad == 5, tab_ref[2, c, l], v)
            v = jnp.where(ad == 7, tab_ref[3, c, l], v)
            limbs.append(v)
        comps.append(limbs)
    for slot in (1, 3, 5):
        for cc in (2 * slot, 2 * slot + 1):
            negd = K.k_neg_2p(comps[cc])
            comps[cc] = [
                jnp.where(neg, x, y) for x, y in zip(negd, comps[cc])
            ]
    return lambda c, l: comps[c][l]


def _tab_out(tab_ref, row):
    def out_set(seg, limbs):
        for l in range(NLIMBS):
            tab_ref[row, seg, l] = limbs[l]

    return out_set


def _pow_w4_kernel(n_steps, dig_ref, m_ref, out_ref, fA, fB, tab):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # table build: tab = [m, m^3, m^5, m^7] (fB holds m^2)
        _cyc_step(_ref_get(m_ref), fB)
        for c in range(12):
            for l in range(NLIMBS):
                tab[0, c, l] = m_ref[c, l]
        _mul_core_v3(_ref_get(fB), _ref_get(m_ref), _tab_out(tab, 1))
        _mul_core_v3(_ref_get(fB), lambda c, l: tab[1, c, l], _tab_out(tab, 2))
        _mul_core_v3(_ref_get(fB), lambda c, l: tab[2, c, l], _tab_out(tab, 3))
        # init: res = table[digits[0]] (top digit; no squaring)
        sel = _tab_select_get(tab, dig_ref[0])
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = sel(c, l)

    d = dig_ref[t]

    @pl.when(t != 0)
    def _():
        _cyc_step(_ref_get(fA), fB)

    @pl.when((t != 0) & (d != 0))
    def _():
        _mul_core_v3(_ref_get(fB), _tab_select_get(tab, d), _ref_out(fA))

    @pl.when((t != 0) & (d == 0))
    def _():
        _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def pow_ladder_w4_pallas(m_arr: jnp.ndarray, digits: np.ndarray,
                         interpret=None) -> jnp.ndarray:
    """res = m^e for cyclotomic m, e encoded as MSB-first w=4 NAF digits
    (top digit consumed by init). Kernel layout in/out."""
    from .jit_cache import cached_jit

    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    key = ("pow_w4", tuple(int(x) for x in digits), bool(interpret))
    return cached_jit(
        key, lambda: lambda m: _pow_w4_impl(m, digits, interpret)
    )(m_arr)


def _pow_w4_impl(m_arr, digits, interpret):
    n_steps = len(digits)
    assert digits[0] > 0, "top w-NAF digit must be positive"
    nrows = m_arr.shape[2]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    kern = partial(_pow_w4_kernel, n_steps)
    fixed_block = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(m_arr.shape, jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), fixed_block],
        out_specs=fixed_block,
        scratch_shapes=[
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((4, 12, NLIMBS, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(np.asarray(digits, np.int32)), m_arr)
    return out


def _wnaf_msb(e: int, w: int) -> np.ndarray:
    from ..utils.bn254 import get_wnaf

    return np.asarray(list(reversed(get_wnaf(e, w))), np.int32)


#: MSB-first BN_X w=4 NAF digits (top digit consumed by ladder init).
BN_X_W4_DIGITS = _wnaf_msb(BN_X, 4)


# ---------------------------------------------------------------------------
# Streamed-operand windowed ladder
# ---------------------------------------------------------------------------
#
# The in-kernel-table w4 ladder (above) holds a 4-entry Fq12 table in VMEM
# scratch (4 MB of the ~16 MB/core budget) and selects the digit operand
# with jnp.where chains + conditional conjugation per multiply step. The
# streamed variant hoists all of that to XLA: the signed table entries
# for each nonzero digit are precomputed (3 muls + conjugates) and
# stacked into an HBM stream; the kernel fetches exactly the entry a
# step needs via a scalar-prefetched block index (zero-digit steps
# revisit the same block, which Pallas does not refetch). The kernel body
# is just cyc-square + optional dense mul.


def _pow_stream_kernel(n_steps, row_ref, dig_ref, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)
    s_get = lambda c, l: s_ref[0, c, l]

    @pl.when(t == 0)
    def _():
        # res = table entry of the top digit (row 0)
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = s_ref[0, c, l]

    @pl.when(t != 0)
    def _():
        _cyc_step(_ref_get(fA), fB)

    d = dig_ref[t]

    @pl.when((t != 0) & (d != 0))
    def _():
        _mul_core_v3(_ref_get(fB), s_get, _ref_out(fA))

    @pl.when((t != 0) & (d == 0))
    def _():
        _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def pow_ladder_stream_pallas(stream: jnp.ndarray, digits: np.ndarray,
                             rows: np.ndarray, interpret=None) -> jnp.ndarray:
    """res = ladder over MSB-first w-NAF ``digits`` with the signed table
    entries pre-selected into ``stream`` [n_rows, 12, NLIMBS, R, 128];
    ``rows[t]`` = stream row holding step t's operand (row 0 = the init
    entry for the top digit; unchanged on zero-digit steps)."""
    n_steps = len(digits)
    assert digits[0] > 0 and rows[0] == 0
    nrows = stream.shape[4 - 1]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    kern = partial(_pow_stream_kernel, n_steps)
    stream_block = pl.BlockSpec(
        (1, 12, NLIMBS, 8, 128),
        lambda bt, t, row_ref: (row_ref[t], 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    out_block = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t, row_ref: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), stream_block],
        out_specs=out_block,
        scratch_shapes=[
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (12, NLIMBS, nrows, 128), jnp.int32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(np.asarray(rows, np.int32)),
        jnp.asarray(np.asarray(digits, np.int32)),
        stream,
    )


# ---------------------------------------------------------------------------
# Bit-ladder exponentiation with per-step row collection (witness offload)
# ---------------------------------------------------------------------------
#
# The C12 exp-offload AIR (final_exp_target.rs:89-147) constrains the
# *bit* ladder row_s = row_{s-1}^2 * x^{b_s} from row_{-1} = 1 — not the
# NAF ladder the production kernels run — so witness generation needs a
# dedicated kernel that follows the bit schedule and streams every row to
# HBM. Squarings use the Granger-Scott cyclotomic core: the offload only
# ever runs on easy-part outputs (cyclotomic subgroup, where cyc-sq is
# value-identical to the dense square), and the witness contract
# (witness/serialize.py: "montgomery-redundant-2p") is value-level, so
# any settled <2p representative of the row value is a valid column.


def _exp_bits_kernel(n_steps, bit_ref, x_ref, out_ref, rows_ref, fA, fB):
    t = pl.program_id(1)
    zero = x_ref[0, 0] * 0

    @pl.when(t == 0)
    def _():
        _write_one(fA, zero)

    # row_s = row_{s-1}^2 (fA -> fB) ...
    _cyc_step(_ref_get(fA), fB)

    b = bit_ref[t]

    # ... * x on set bits (fB -> fA)
    @pl.when(b != 0)
    def _():
        _mul_core_v3(_ref_get(fB), _ref_get(x_ref), _ref_out(fA))

    @pl.when(b == 0)
    def _():
        _copy_f(fA, fB)

    for c in range(12):
        for l in range(NLIMBS):
            rows_ref[0, c, l] = fA[c, l]

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def exp_bits_ladder_pallas(x_arr: jnp.ndarray, bits, interpret=None):
    """x^e with e given as MSB-first bits, emitting all ladder rows.

    x_arr: kernel layout [12, NLIMBS, R, 128], cyclotomic-subgroup values.
    Returns (out, rows) with rows [len(bits), 12, NLIMBS, R, 128] — the
    per-bit AIR rows (rows[-1] == out; the offset multiply is the
    caller's, final_exp_target.rs:91-95 uses offset = 1)."""
    from .jit_cache import cached_jit

    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    key = ("exp_bits", tuple(int(b) for b in bits), bool(interpret))
    return cached_jit(
        key, lambda: lambda x: _exp_bits_impl(x, bits, interpret)
    )(x_arr)


def _exp_bits_impl(x_arr, bits, interpret):
    n_steps = len(bits)
    nrows = x_arr.shape[2]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    kern = partial(_exp_bits_kernel, n_steps)
    fixed_block = pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    rows_block = pl.BlockSpec(
        (1, 12, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    out, rows = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x_arr.shape, jnp.int32),
            jax.ShapeDtypeStruct((n_steps,) + x_arr.shape, jnp.int32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), fixed_block],
        out_specs=(fixed_block, rows_block),
        scratch_shapes=[
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
            pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(np.asarray(bits, np.int32)), x_arr)
    return out, rows


#: MSB-first 64-bit decomposition of BN_X (the exp-offload exponent).
BN_X_BITS_MSB = np.asarray(
    [(BN_X >> (63 - i)) & 1 for i in range(64)], np.int32
)


def pow_x_streamed(m_arr: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """m^BN_X on the cyclotomic subgroup via the streamed w4 ladder.

    Table (m, m^3, m^5, m^7 and conjugates as needed) is built with the
    standard klayout kernels; the ladder kernel holds only the two f
    buffers in VMEM."""
    from . import klayout as KL

    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    digits = BN_X_W4_DIGITS
    m2 = KL.kcyc_sq(m_arr, interpret=interpret)
    ent = {1: m_arr}
    ent[3] = KL.kmul(m2, ent[1], interpret=interpret)
    ent[5] = KL.kmul(m2, ent[3], interpret=interpret)
    ent[7] = KL.kmul(m2, ent[5], interpret=interpret)

    # One stream row per DISTINCT signed digit (<= 8), not per occurrence:
    # repeated digits reuse the same block (Pallas refetches only on index
    # change), halving the stacked-stream HBM traffic vs the per-occurrence
    # layout. Zero-digit steps keep the previous row resident.
    rows_list = []
    row_of_step = []
    row_of = {}
    r = 0
    for t, d in enumerate(int(x) for x in digits):
        if d != 0 or t == 0:
            if d not in row_of:
                e = ent[abs(d)]
                if d < 0:
                    e = KL.kconj(e, interpret=interpret)
                row_of[d] = len(rows_list)
                rows_list.append(e)
            r = row_of[d]
        row_of_step.append(r)
    stream = jnp.stack(rows_list)
    return pow_ladder_stream_pallas(
        stream, digits, np.asarray(row_of_step, np.int32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused hard-part chain: an Fq12 register-file program in ONE kernel
# ---------------------------------------------------------------------------
#
# hard_part_chain_k previously issued ~29 separate Pallas launches (13
# dense muls, 4 cyclotomic squares, 6 conjugates, 7 Frobenius maps), each
# paying a full HBM read/write of every operand (~200 MB of traffic per
# launch pair at batch 16384).  This kernel executes the whole chain
# (final_exp_native.rs:130-169 with mx/mx2/mx3 precomputed) as ONE
# launch: an 8-register Fq12 file in VMEM, an SMEM program, and a fori
# loop whose body holds one predicated block per opcode (skipped blocks
# are free — probe-verified).  The four inputs stay in HBM and are DMA'd
# into registers at step start, keeping VMEM to regs (8 MB) + out block.

OPC_MUL, OPC_CYC, OPC_CONJ, OPC_F1, OPC_F2, OPC_F3 = range(6)

#: (op, dst, a, b) schedule of the hard-part chain; dst never aliases a
#: MUL/CYC source (CONJ/FROB are slotwise and alias-safe).  Registers
#: r0..r3 preload m, mx, mx2, mx3; result in r5.
HARD_CHAIN_PROG = (
    (OPC_F1, 4, 0, 0),    # mp = frob1(m)
    (OPC_F2, 5, 0, 0),    # mp2
    (OPC_MUL, 6, 4, 5),   # mp*mp2
    (OPC_F3, 4, 0, 0),    # mp3
    (OPC_MUL, 5, 6, 4),   # y0  (held to the end)
    (OPC_F1, 4, 3, 0),    # mx3p
    (OPC_MUL, 6, 3, 4),   # mx3*mx3p
    (OPC_CONJ, 6, 6, 0),  # y6
    (OPC_CYC, 3, 6, 0),   # sq6 = y6^2        (mx3 dead)
    (OPC_F1, 4, 2, 0),    # mx2p
    (OPC_MUL, 6, 1, 4),   # mx*mx2p
    (OPC_CONJ, 6, 6, 0),  # y4
    (OPC_MUL, 4, 3, 6),   # t0a = sq6*y4
    (OPC_CONJ, 6, 2, 0),  # y5
    (OPC_MUL, 3, 4, 6),   # t0 = t0a*y5
    (OPC_F1, 4, 1, 0),    # mxp               (mx dead)
    (OPC_CONJ, 4, 4, 0),  # y3
    (OPC_MUL, 7, 4, 6),   # t1a = y3*y5
    (OPC_MUL, 4, 7, 3),   # t1 = t1a*t0
    (OPC_F2, 6, 2, 0),    # y2                (mx2 dead)
    (OPC_MUL, 7, 6, 3),   # t0b = y2*t0
    (OPC_CYC, 3, 4, 0),   # t1b = t1^2
    (OPC_MUL, 6, 3, 7),   # t1c = t1b*t0b
    (OPC_CYC, 3, 6, 0),   # t1d = t1c^2
    (OPC_CONJ, 6, 0, 0),  # y1 = conj(m)      (m dead)
    (OPC_MUL, 7, 3, 6),   # ta = t1d*y1
    (OPC_MUL, 4, 3, 5),   # tb = t1d*y0
    (OPC_CYC, 3, 7, 0),   # ta2 = ta^2
    (OPC_MUL, 5, 3, 4),   # final = ta2*tb
)
HARD_CHAIN_NREG = 8
HARD_CHAIN_OUT = 5


def _chain_kernel(n_ops, prog_ref, in_hbm, out_ref, regs, sem):
    bt = pl.program_id(0)
    from .klayout import _frob_prog

    # DMA the four inputs into registers 0..3 (inputs stay in HBM: with
    # an 8 MB register file there is no VMEM room for double-buffered
    # input blocks).
    for i in range(4):
        dma = pltpu.make_async_copy(
            in_hbm.at[i, :, :, pl.ds(bt * 8, 8), :],
            regs.at[i],
            sem,
        )
        dma.start()
        dma.wait()

    def body(t, _):
        op = prog_ref[t, 0]
        dst = prog_ref[t, 1]
        a = prog_ref[t, 2]
        b = prog_ref[t, 3]

        @pl.when(op == OPC_MUL)
        def _():
            def out_set(seg, limbs):
                for l in range(NLIMBS):
                    regs[dst, seg, l] = limbs[l]

            _mul_core_v3(
                lambda c, l: regs[a, c, l],
                lambda c, l: regs[b, c, l],
                out_set,
            )

        @pl.when(op == OPC_CYC)
        def _():
            slots_in = [
                (
                    [regs[a, 2 * i, l] for l in range(NLIMBS)],
                    [regs[a, 2 * i + 1, l] for l in range(NLIMBS)],
                )
                for i in range(6)
            ]
            sq = K.k_cyc_sq(slots_in)
            for i in range(6):
                for l in range(NLIMBS):
                    regs[dst, 2 * i, l] = sq[i][0][l]
                    regs[dst, 2 * i + 1, l] = sq[i][1][l]

        @pl.when(op == OPC_CONJ)
        def _():
            for i in range(6):
                c0 = [regs[a, 2 * i, l] for l in range(NLIMBS)]
                c1 = [regs[a, 2 * i + 1, l] for l in range(NLIMBS)]
                if i % 2 == 1:
                    c0 = K.k_neg_2p(c0)
                    c1 = K.k_neg_2p(c1)
                for l in range(NLIMBS):
                    regs[dst, 2 * i, l] = c0[l]
                    regs[dst, 2 * i + 1, l] = c1[l]

        for opc, pw in ((OPC_F1, 1), (OPC_F2, 2), (OPC_F3, 3)):

            @pl.when(op == opc)
            def _(prog=_frob_prog(pw)):
                for i, (neg_c0, neg_c1, const) in enumerate(prog):
                    c0 = [regs[a, 2 * i, l] for l in range(NLIMBS)]
                    c1 = [regs[a, 2 * i + 1, l] for l in range(NLIMBS)]
                    if neg_c0:
                        c0 = K.k_neg_2p(c0)
                    if neg_c1:
                        c1 = K.k_neg_2p(c1)
                    if const is not None:
                        g0, g1, ng1 = const

                        def cmul(x, climbs):
                            return K.k_carry(
                                K.k_pad(
                                    K.k_mul_const(x, climbs, K.WIDE), K.WIDE
                                ),
                                3,
                            )

                        w0 = [
                            p + q
                            for p, q in zip(cmul(c0, g0), cmul(c1, ng1))
                        ]
                        w1 = [
                            p + q
                            for p, q in zip(cmul(c0, g1), cmul(c1, g0))
                        ]
                        c0 = K.k_mont_reduce(w0, limb_bound=2 * SETTLED)
                        c1 = K.k_mont_reduce(w1, limb_bound=2 * SETTLED)
                    for l in range(NLIMBS):
                        regs[dst, 2 * i, l] = c0[l]
                        regs[dst, 2 * i + 1, l] = c1[l]

        return 0

    jax.lax.fori_loop(0, n_ops, body, 0)

    for c in range(12):
        for l in range(NLIMBS):
            out_ref[c, l] = regs[HARD_CHAIN_OUT, c, l]


def hard_chain_pallas(m, mx, mx2, mx3, interpret=None):
    """The full hard-part accumulation chain as one kernel launch.

    Inputs/output: KF12 [12, NLIMBS, R, 128], cyclotomic subgroup
    (post-easy-part).  Value-identical to the 29-launch klayout chain
    (final_exp_native.rs:130-169)."""
    from .jit_cache import cached_jit

    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    key = ("hard_chain", bool(interpret))
    return cached_jit(
        key, lambda: lambda *xs: _hard_chain_impl(xs, interpret)
    )(m, mx, mx2, mx3)


def _hard_chain_impl(xs, interpret):
    stacked = jnp.stack(xs)  # [4, 12, NLIMBS, R, 128]
    nrows = stacked.shape[3]
    assert nrows % 8 == 0
    prog = np.asarray(HARD_CHAIN_PROG, np.int32)
    return pl.pallas_call(
        partial(_chain_kernel, len(HARD_CHAIN_PROG)),
        out_shape=jax.ShapeDtypeStruct(
            (12, NLIMBS, nrows, 128), jnp.int32
        ),
        grid=(nrows // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (12, NLIMBS, 8, 128), lambda bt: (0, 0, bt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (HARD_CHAIN_NREG, 12, NLIMBS, 8, 128), jnp.int32
            ),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray(prog), stacked)
