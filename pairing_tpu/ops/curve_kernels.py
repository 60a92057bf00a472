"""Pallas kernel for the Miller-loop point trajectory (Phase B).

Walks the 64 NAF steps in Jacobian coordinates with the running point
resident in VMEM, emitting per-step (loop-top, post-double) states for the
bulk normalization phase. Replaces the XLA lax.scan, whose ~50 sequential
small ops per step are HBM-latency bound.

Formulas: dbl-2009-l (a=0) and madd-2007-bl, identical to curves.g2's XLA
versions — affine results after normalization are bit-exact either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import NLIMBS, R_MOD_P, _const_limbs
from ..utils.bn254 import P
from . import kernel_core as K
from .kernel_core import KV, KV2, kv2_add, kv2_mul, kv2_neg, kv2_scale, kv2_select, kv2_square, kv2_sub

ONE_MONT = [int(x) for x in _const_limbs(R_MOD_P)]


def _read_kv2(ref, base) -> KV2:
    c0 = KV([ref[base, l] for l in range(NLIMBS)], 2 * P)
    c1 = KV([ref[base + 1, l] for l in range(NLIMBS)], 2 * P)
    return KV2(c0, c1)


def _write_kv2(ref, base, v: KV2):
    for l in range(NLIMBS):
        ref[base, l] = v.c0.limbs[l]
        ref[base + 1, l] = v.c1.limbs[l]


def _jac_double(X, Y, Z):
    A = kv2_square(X)
    B = kv2_square(Y)
    C = kv2_square(B)
    t = kv2_square(kv2_add(X, B))
    D = kv2_scale(kv2_sub(kv2_sub(t, A), C), 2)
    E = kv2_scale(A, 3)
    F = kv2_square(E)
    X3 = kv2_sub(F, kv2_scale(D, 2))
    Y3 = kv2_sub(kv2_mul(E, kv2_sub(D, X3)), kv2_scale(C, 8))
    Z3 = kv2_scale(kv2_mul(Y, Z), 2)
    return X3, Y3, Z3


def _jac_mixed_add(X, Y, Z, qx, qy):
    Z1Z1 = kv2_square(Z)
    U2 = kv2_mul(qx, Z1Z1)
    S2 = kv2_mul(kv2_mul(qy, Z), Z1Z1)
    H = kv2_sub(U2, X)
    HH = kv2_square(H)
    I = kv2_scale(HH, 4)
    J = kv2_mul(H, I)
    r = kv2_scale(kv2_sub(S2, Y), 2)
    V = kv2_mul(X, I)
    X3 = kv2_sub(kv2_sub(kv2_square(r), J), kv2_scale(V, 2))
    Y3 = kv2_sub(kv2_mul(r, kv2_sub(V, X3)), kv2_scale(kv2_mul(Y, J), 2))
    Z3 = kv2_sub(kv2_sub(kv2_square(kv2_add(Z, H)), Z1Z1), HH)
    return X3, Y3, Z3


def _cap2(v: KV2) -> KV2:
    # outputs of mul/square are < 2p already; linear results may exceed —
    # fold via weak reduce so the stored state keeps the (2p, settled)
    # envelope.
    def cap(x: KV) -> KV:
        if x.bound <= 2 * P:
            return x
        return K._kv_prep(KV(x.limbs, 1 << 260))  # force weak reduce

    return KV2(cap(v.c0), cap(v.c1))


def _traj_kernel(n_steps, dig_ref, q_ref, out_top, out_dbl, out_end, state):
    t = pl.program_id(1)
    zero = q_ref[0, 0] * 0

    @pl.when(t == 0)
    def _():
        for comp in range(4):
            for l in range(NLIMBS):
                state[comp, l] = q_ref[comp, l]
        for l in range(NLIMBS):
            state[4, l] = zero + ONE_MONT[l]  # Z.c0 = 1
            state[5, l] = zero  # Z.c1 = 0

    X = _read_kv2(state, 0)
    Y = _read_kv2(state, 2)
    Z = _read_kv2(state, 4)

    # emit loop-top state
    for comp in range(6):
        for l in range(NLIMBS):
            out_top[0, comp, l] = state[comp, l]

    Xd, Yd, Zd = _jac_double(X, Y, Z)
    Xd, Yd, Zd = _cap2(Xd), _cap2(Yd), _cap2(Zd)
    for base, v in ((0, Xd), (2, Yd), (4, Zd)):
        for l in range(NLIMBS):
            out_dbl[0, base + (0), l] = v.c0.limbs[l]
            out_dbl[0, base + 1, l] = v.c1.limbs[l]

    digit = dig_ref[t]
    qx = _read_kv2(q_ref, 0)
    qy = _read_kv2(q_ref, 2)
    qy_sel = kv2_select(digit > 0, qy, kv2_neg(qy))
    qy_sel = KV2(KV(qy_sel.c0.limbs, 2 * P + 1), KV(qy_sel.c1.limbs, 2 * P + 1))
    Xa, Ya, Za = _jac_mixed_add(Xd, Yd, Zd, qx, qy_sel)
    Xa, Ya, Za = _cap2(Xa), _cap2(Ya), _cap2(Za)

    keep = digit != 0
    Xn = kv2_select(keep, Xa, Xd)
    Yn = kv2_select(keep, Ya, Yd)
    Zn = kv2_select(keep, Za, Zd)
    _write_kv2(state, 0, Xn)
    _write_kv2(state, 2, Yn)
    _write_kv2(state, 4, Zn)

    @pl.when(t == n_steps - 1)
    def _():
        for comp in range(6):
            for l in range(NLIMBS):
                out_end[comp, l] = state[comp, l]


def trajectory_pallas(q_arr: jnp.ndarray, digits: np.ndarray, interpret=None):
    """q_arr: affine Q kernel layout [4, NLIMBS, R, 128] (x.c0, x.c1,
    y.c0, y.c1). Returns (tops, dbls, end): [steps, 6, L, R, 128] x2 and
    [6, L, R, 128] Jacobian states (X, Y, Z as Fq2 pairs)."""
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    n_steps = len(digits)
    nrows = q_arr.shape[2]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    step_block = pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    tops, dbls, end = pl.pallas_call(
        partial(_traj_kernel, n_steps),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 6, NLIMBS, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 6, NLIMBS, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((6, NLIMBS, nrows, 128), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (4, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            step_block,
            step_block,
            pl.BlockSpec(
                (6, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[pltpu.VMEM((6, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(np.asarray(digits, np.int32)), q_arr)
    return tops, dbls, end
