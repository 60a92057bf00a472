"""Pallas kernel for the Miller-loop point trajectory (Phase B).

Walks the 64 NAF steps in Jacobian coordinates with the running point
resident in a VMEM register file, emitting per-step (loop-top,
post-double) states for the bulk normalization phase. The per-step point
arithmetic (dbl-2009-l + madd-2007-bl, ~30 Fq2 ops) runs on the
:mod:`fq2_vm` sequencer so kernel IR stays O(1) in program length.

Affine results after normalization are bit-exact with the XLA scan (same
formulas, same Montgomery envelope).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import NLIMBS, R_MOD_P, _const_limbs
from ..utils.bn254 import P
from . import kernel_core as K
from .fq2_vm import Fq2Assembler, _kp_table, run_program

ONE_MONT = [int(x) for x in _const_limbs(R_MOD_P)]

# register map
R_X, R_Y, R_Z = 0, 1, 2  # running state
R_XD, R_YD, R_ZD = 3, 4, 5  # post-double
R_QX, R_QY = 6, 7  # affine partner (qy sign-selected per step)
R_XA, R_YA, R_ZA = 14, 15, 16  # post-add
NREG = 18


def _assemble_step(bx: int, by: int, bz: int) -> Fq2Assembler:
    a = Fq2Assembler(NREG)
    for r, b in ((R_X, bx), (R_Y, by), (R_Z, bz),
                 (R_QX, 2 * P), (R_QY, 2 * P + 2)):
        a.set_bound(r, b)

    # --- double: (r0, r1, r2) -> (r3, r4, r5)   [dbl-2009-l, a=0]
    a.sq(8, R_X)            # A
    a.sq(9, R_Y)            # B
    a.sq(10, 9)             # C
    a.add(11, R_X, 9)
    a.sq(11, 11)            # (X+B)^2
    a.sub(11, 11, 8)
    a.sub(11, 11, 10)
    a.scale(11, 11, 2)      # D
    a.scale(8, 8, 3)        # E = 3A
    a.sq(12, 8)             # F
    a.scale(13, 11, 2)
    a.sub(R_XD, 12, 13)     # X3 = F - 2D
    a.sub(13, 11, R_XD)
    a.mul(13, 8, 13)        # E (D - X3)
    a.scale(10, 10, 8)      # 8C
    a.sub(R_YD, 13, 10)     # Y3
    a.mul(13, R_Y, R_Z)
    a.scale(R_ZD, 13, 2)    # Z3 = 2YZ

    # --- mixed add: (r3..r5) + (r6, r7) -> (r14..r16)  [madd-2007-bl]
    a.sq(8, R_ZD)           # Z1Z1
    a.mul(9, R_QX, 8)       # U2
    a.mul(10, R_QY, R_ZD)
    a.mul(10, 10, 8)        # S2
    a.sub(9, 9, R_XD)       # H
    a.sq(11, 9)             # HH
    a.scale(12, 11, 4)      # I
    a.mul(13, 9, 12)        # J
    a.sub(10, 10, R_YD)
    a.scale(10, 10, 2)      # r
    a.mul(12, R_XD, 12)     # V
    a.sq(R_XA, 10)
    a.sub(R_XA, R_XA, 13)
    a.scale(17, 12, 2)
    a.sub(R_XA, R_XA, 17)   # X3 = r^2 - J - 2V
    a.sub(12, 12, R_XA)
    a.mul(12, 10, 12)       # r (V - X3)
    a.mul(13, R_YD, 13)
    a.scale(13, 13, 2)      # 2 Y1 J
    a.sub(R_YA, 12, 13)     # Y3
    a.add(17, R_ZD, 9)
    a.sq(17, 17)
    a.sub(17, 17, 8)
    a.sub(R_ZA, 17, 11)     # Z3 = (Z+H)^2 - Z1Z1 - HH
    return a


@lru_cache(maxsize=None)
def _step_program_and_bounds():
    """Fixed-point assembly of the per-step program WITHOUT output caps.

    The emitted states are redundant Montgomery representatives with
    value bounds above 2p (the KW layer's budget tolerates this; caps
    cost one const-mul + Montgomery reduce per component — 6 of them per
    step were ~22%% of the trajectory kernel). Consumers must use the
    returned static bounds: ``top`` bounds the loop-top/end states (the
    per-step select of post-add/post-double), ``dbl`` the post-double
    stream.
    """
    bx = by = bz = 2 * P
    for _ in range(16):
        a = _assemble_step(bx, by, bz)
        nbx = max(a.bound[R_XD], a.bound[R_XA], bx)
        nby = max(a.bound[R_YD], a.bound[R_YA], by)
        nbz = max(a.bound[R_ZD], a.bound[R_ZA], bz)
        if (nbx, nby, nbz) == (bx, by, bz):
            break
        bx, by, bz = nbx, nby, nbz
    else:  # pragma: no cover
        raise AssertionError("trajectory bound fixed point did not converge")
    bounds = {
        "top": (bx, by, bz),
        "dbl": (a.bound[R_XD], a.bound[R_YD], a.bound[R_ZD]),
    }
    return a.table(), bounds


def _step_program() -> np.ndarray:
    return _step_program_and_bounds()[0]


def trajectory_bounds():
    """Static value bounds of trajectory_pallas outputs (see
    _step_program_and_bounds): {'top': (bx, by, bz), 'dbl': (...)}. The
    end state carries the 'top' bounds."""
    return _step_program_and_bounds()[1]


def _traj_kernel(n_steps, n_ops, dig_ref, prog_ref, kp_ref, q_ref,
                 out_top, out_dbl, out_end, regs):
    t = pl.program_id(1)
    zero = q_ref[0, 0] * 0

    @pl.when(t == 0)
    def _():
        # state <- (qx, qy, 1)
        for l in range(NLIMBS):
            regs[R_X, 0, l] = q_ref[0, l]
            regs[R_X, 1, l] = q_ref[1, l]
            regs[R_Y, 0, l] = q_ref[2, l]
            regs[R_Y, 1, l] = q_ref[3, l]
            regs[R_Z, 0, l] = zero + ONE_MONT[l]
            regs[R_Z, 1, l] = zero

    # per-step prologue: partner = (qx, +-qy)
    digit = dig_ref[t]
    qy0 = [q_ref[2, l] for l in range(NLIMBS)]
    qy1 = [q_ref[3, l] for l in range(NLIMBS)]
    nqy0 = K.k_neg_2p(qy0)
    nqy1 = K.k_neg_2p(qy1)
    pos = digit > 0
    for l in range(NLIMBS):
        regs[R_QX, 0, l] = q_ref[0, l]
        regs[R_QX, 1, l] = q_ref[1, l]
        regs[R_QY, 0, l] = jnp.where(pos, qy0[l], nqy0[l])
        regs[R_QY, 1, l] = jnp.where(pos, qy1[l], nqy1[l])

    # emit loop-top state
    for i, r in enumerate((R_X, R_Y, R_Z)):
        for c in range(2):
            for l in range(NLIMBS):
                out_top[0, 2 * i + c, l] = regs[r, c, l]

    run_program(prog_ref, n_ops, regs, kp_ref)

    # emit post-double state
    for i, r in enumerate((R_XD, R_YD, R_ZD)):
        for c in range(2):
            for l in range(NLIMBS):
                out_dbl[0, 2 * i + c, l] = regs[r, c, l]

    # state <- digit != 0 ? added : doubled
    take = digit != 0
    for dst, ra, rd in ((R_X, R_XA, R_XD), (R_Y, R_YA, R_YD), (R_Z, R_ZA, R_ZD)):
        for c in range(2):
            for l in range(NLIMBS):
                regs[dst, c, l] = jnp.where(
                    take, regs[ra, c, l], regs[rd, c, l]
                )

    @pl.when(t == n_steps - 1)
    def _():
        for i, r in enumerate((R_X, R_Y, R_Z)):
            for c in range(2):
                for l in range(NLIMBS):
                    out_end[2 * i + c, l] = regs[r, c, l]


def trajectory_pallas(q_arr: jnp.ndarray, digits: np.ndarray, interpret=None):
    """q_arr: affine Q kernel layout [4, NLIMBS, R, 128] (x.c0, x.c1,
    y.c0, y.c1). Returns (tops, dbls, end): [steps, 6, L, R, 128] x2 and
    [6, L, R, 128] Jacobian states (X, Y, Z as Fq2 pairs), all in the
    (2p, settled) envelope."""
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    prog = _step_program()
    n_ops = prog.shape[0]
    n_steps = len(digits)
    nrows = q_arr.shape[2]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    step_block = pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tops, dbls, end = pl.pallas_call(
        partial(_traj_kernel, n_steps, n_ops),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 6, NLIMBS, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 6, NLIMBS, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((6, NLIMBS, nrows, 128), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            smem(),
            smem(),
            smem(),
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
        scratch_shapes=[pltpu.VMEM((NREG, 2, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(
        jnp.asarray(np.asarray(digits, np.int32)),
        jnp.asarray(prog),
        jnp.asarray(_kp_table()),
        q_arr,
    )
    return tops, dbls, end
