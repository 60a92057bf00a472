"""Pallas kernel for Miller-loop line evaluation (Phase C).

Round-1 ran Phase C as XLA field ops over the normalized trajectory,
which cost ~94 ms / 2048 lanes — dominated by layout transposes and XLA
op-chain overhead, not compute. This kernel consumes the trajectory and
zinv streams directly in kernel layout and emits the tangent/chord line
streams that feed the fused f-accumulation kernel, with the
Jacobian→affine conversion folded in (no materialized affine stack).

Per grid step t (one Miller iteration):
  affine top   (x, y)  = (X_t * zinv_t^2,  Y_t * zinv_t^3)
  tangent (sparse_line_function_equal_native, miller_loop_native.rs:30-44):
      out0 = (3x^3 - 2y^2) * xi,  out3 = 2 y Py,  out4 = -3 x^2 Px
  affine post-double (cx, cy) likewise from the dbl stream
  chord (sparse_line_function_unequal_native, miller_loop_native.rs:10-28),
  partner = +-Q by the NAF digit:
      out2 = (qx - cx) Py,  out3 = (cy - qy) Px,  out5 = cx qy - qx cy

The Fq2 math runs on the fq2_vm sequencer (host-assembled program with
static bound tracking); chord ops are skipped on zero-digit steps via a
per-step dynamic instruction count. Px/Py enter as Fq2 values with zero
imaginary part, making mul_fp a plain VM mul.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import NLIMBS
from ..utils.bn254 import P
from . import kernel_core as K
from .fq2_vm import Fq2Assembler, _kp_table, run_program

# register map: inputs
R_XT, R_YT, R_ZIT = 0, 1, 2  # top state X, Y, zinv
R_XD, R_YD, R_ZID = 3, 4, 5  # post-double state X, Y, zinv
R_PX, R_PY = 6, 7  # G1 point as zero-imag Fq2
R_QX, R_QY = 8, 9  # partner (qy sign-selected per step)
R_ZERO = 10
# outputs (see _line_program)
T_OUT0, T_OUT3, T_OUT4 = 16, 19, 18
C_OUT2, C_OUT3, C_OUT5 = 17, 15, 20
NREG = 22


@lru_cache(maxsize=None)
def _line_program(state_bounds=None):
    """Returns (prog_table, n_ops_tangent, n_ops_full, out_bound).

    ``state_bounds``: ((bx_top, by_top), (bx_dbl, by_dbl)) value bounds of
    the trajectory X/Y inputs (redundant representatives from
    curve_kernels.trajectory_bounds); None -> the 2p envelope.

    The line outputs are NOT capped (the weak reductions were ~24% of the
    kernel): ``out_bound`` is the max static value bound over all six
    output registers — the fused f kernel's sparse cores take it as the
    line-operand bound."""
    (bxt, byt), (bxd, byd) = state_bounds or ((2 * P, 2 * P), (2 * P, 2 * P))
    a = Fq2Assembler(NREG)
    for r, b in (
        (R_XT, bxt), (R_YT, byt), (R_ZIT, 2 * P),
        (R_XD, bxd), (R_YD, byd), (R_ZID, 2 * P),
        (R_PX, 2 * P), (R_PY, 2 * P), (R_QX, 2 * P),
    ):
        a.set_bound(r, b)
    a.set_bound(R_QY, 2 * P + 2)  # may be a negation (2p - y)
    a.set_bound(R_ZERO, 1)

    # --- tangent from the top state
    a.sq(11, R_ZIT)  # zi^2
    a.mul(12, 11, R_ZIT)  # zi^3
    a.mul(13, R_XT, 11)  # x
    a.mul(14, R_YT, 12)  # y
    a.sq(15, 13)  # x^2
    a.mul(16, 15, 13)  # x^3
    a.sq(17, 14)  # y^2
    a.scale(16, 16, 3)
    a.scale(17, 17, 2)
    a.sub(16, 16, 17)  # 3x^3 - 2y^2
    a.mul_w6(16, 16)  # out0
    a.mul(18, 15, R_PX)
    a.scale(18, 18, 3)
    a.sub(18, R_ZERO, 18)  # out4 = -3 x^2 Px
    a.mul(19, 14, R_PY)
    a.scale(19, 19, 2)  # out3
    n_tan = len(a.prog)
    out_bound = max(a.bound[16], a.bound[18], a.bound[19])
    # registers 15/17/20 hold tangent temps on zero-digit steps (the
    # chord section is skipped there); their chord rows are never
    # multiplied, but the static operand bound must still cover them
    tan_garbage = max(a.bound[15], a.bound[17], a.bound[20] or 0)

    # --- chord from the post-double state and +-Q
    a.sq(11, R_ZID)
    a.mul(12, 11, R_ZID)
    a.mul(13, R_XD, 11)  # cx
    a.mul(14, R_YD, 12)  # cy
    a.sub(15, 14, R_QY)
    a.mul(15, 15, R_PX)  # out3 = (cy - qy) Px
    a.sub(17, R_QX, 13)
    a.mul(17, 17, R_PY)  # out2 = (qx - cx) Py
    a.mul(20, 13, R_QY)
    a.mul(21, R_QX, 14)
    a.sub(20, 20, 21)  # out5 = cx qy - qx cy
    out_bound = max(
        out_bound, a.bound[15], a.bound[17], a.bound[20], tan_garbage
    )
    return a.table(), n_tan, len(a.prog), out_bound


def _lines_kernel(n_ops_ref, prog_ref, kp_ref, dig_ref,
                  top_ref, dbl_ref, zit_ref, zid_ref, pq_ref,
                  tg_ref, ch_ref, regs):
    t = pl.program_id(1)
    zero = pq_ref[0, 0] * 0

    # load inputs: top/dbl X, Y rows 0..3; zinv pairs; fixed P/Q rows
    for c in range(2):
        for l in range(NLIMBS):
            regs[R_XT, c, l] = top_ref[0, c, l]
            regs[R_YT, c, l] = top_ref[0, 2 + c, l]
            regs[R_ZIT, c, l] = zit_ref[0, c, l]
            regs[R_XD, c, l] = dbl_ref[0, c, l]
            regs[R_YD, c, l] = dbl_ref[0, 2 + c, l]
            regs[R_ZID, c, l] = zid_ref[0, c, l]
            regs[R_QX, c, l] = pq_ref[2 + c, l]
            regs[R_ZERO, c, l] = zero
    for l in range(NLIMBS):
        regs[R_PX, 0, l] = pq_ref[0, l]
        regs[R_PX, 1, l] = zero
        regs[R_PY, 0, l] = pq_ref[1, l]
        regs[R_PY, 1, l] = zero

    digit = dig_ref[t]
    qy0 = [pq_ref[4, l] for l in range(NLIMBS)]
    qy1 = [pq_ref[5, l] for l in range(NLIMBS)]
    nqy0 = K.k_neg_2p(qy0)
    nqy1 = K.k_neg_2p(qy1)
    pos = digit > 0
    for l in range(NLIMBS):
        regs[R_QY, 0, l] = jnp.where(pos, qy0[l], nqy0[l])
        regs[R_QY, 1, l] = jnp.where(pos, qy1[l], nqy1[l])

    run_program(prog_ref, n_ops_ref[t], regs, kp_ref)

    for j, r in enumerate((T_OUT0, T_OUT3, T_OUT4)):
        for c in range(2):
            for l in range(NLIMBS):
                tg_ref[0, 2 * j + c, l] = regs[r, c, l]
    for j, r in enumerate((C_OUT2, C_OUT3, C_OUT5)):
        for c in range(2):
            for l in range(NLIMBS):
                ch_ref[0, 2 * j + c, l] = regs[r, c, l]


def lines_pallas(tops, dbls, zinv, pq, digits: np.ndarray, interpret=None,
                 state_bounds=None):
    """Evaluate all tangent + chord lines over the trajectory streams.

    tops/dbls: [steps, 6, L, R, 128] Jacobian streams (X, Y, Z rows; Z
    ignored); zinv: [2*steps(+extra), 2, L, R, 128] with top zinvs at
    [0:steps] and post-double zinvs at [steps:2*steps]; pq: fixed
    [6, L, R, 128] rows (px, py, qx0, qx1, qy0, qy1); digits: int32 NAF
    digits per step. Returns (tg, ch, out_bound): the line streams
    [steps, 6, L, R, 128] (rows out0|2 .c0,.c1, out3 .c0,.c1,
    out4|5 .c0,.c1) hold redundant representatives with static value
    bound ``out_bound`` (settled limbs). Chord rows on zero-digit steps
    are unspecified (never consumed).
    """
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    prog, n_tan, n_full, out_bound = _line_program(state_bounds)
    n_steps = len(digits)
    nrows = tops.shape[3]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)
    n_ops = np.where(np.asarray(digits) != 0, n_full, n_tan).astype(np.int32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    state_blk = pl.BlockSpec(
        (1, 4, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    zit_blk = pl.BlockSpec(
        (1, 2, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    zid_blk = pl.BlockSpec(
        (1, 2, NLIMBS, 8, 128),
        lambda bt, t, n=n_steps: (n + t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    pq_blk = pl.BlockSpec(
        (6, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    out_blk = pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    tg, ch = pl.pallas_call(
        _lines_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 6, NLIMBS, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 6, NLIMBS, nrows, 128), jnp.int32),
        ),
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(),
                  state_blk, state_blk, zit_blk, zid_blk, pq_blk],
        out_specs=(out_blk, out_blk),
        scratch_shapes=[pltpu.VMEM((NREG, 2, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(
        jnp.asarray(n_ops), jnp.asarray(prog), jnp.asarray(_kp_table()),
        jnp.asarray(np.asarray(digits, np.int32)),
        tops, dbls, zinv, zinv, pq,
    )
    return tg, ch, out_bound
