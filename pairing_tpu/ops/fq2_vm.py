"""A tiny in-kernel Fq2 "sequencer": host-assembled instruction programs
executed over a VMEM register file.

Motivation: the point-arithmetic phases of the pairing (Jacobian
trajectory, batched normalization) are *sequential chains of Fq2 ops* —
fully unrolling them in a Pallas kernel explodes the instruction count
(each Fq2 multiply is ~8k vector instructions), while running them as XLA
op-chains pays per-op overheads that dominate wall clock. The sequencer
keeps kernel IR O(1) in program length: a fori loop walks an SMEM-encoded
program; each step executes exactly one of six predicated primitive
blocks (MUL/SQ/ADD/SUB/SCALE/RED) against a [NREG, 2, NLIMBS, 8, 128]
register file.

The host-side :class:`Fq2Assembler` tracks static value bounds per
register (mirroring fields.fp) and auto-inserts weak reductions and the
right k*p offsets for subtraction, so programs are correct by
construction under the same envelope discipline as the rest of the stack.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import MASK, NLIMBS, R_MOD_P, _const_limbs
from ..utils.bn254 import P
from . import kernel_core as K

OP_MUL, OP_SQ, OP_ADD, OP_SUB, OP_SCALE, OP_RED, OP_MULW6 = range(7)

#: k values available to SUB (imm indexes this table)
SUB_KS = (1, 2, 4, 8, 16, 32, 64, 128)

#: value envelope of MUL/SQ operands. The KW signed-wide layer proves
#: int32/Montgomery budgets for operand values far beyond 2p (kw_finalize
#: asserts ~0.99*R*p at trace time; 64p x 128p products use < 2^-4 of
#: it), so the assembler only inserts weak reductions when a register's
#: tracked bound exceeds THIS — the old 4p envelope forced a RED (one
#: const-mul + Montgomery reduce per component, as expensive as the
#: product itself) before most multiplies: 6 of the trajectory step's 12
#: REDs were such preps.
MUL_ENVELOPE = 64 * P

ONE_MONT = [int(x) for x in _const_limbs(R_MOD_P)]


@lru_cache(maxsize=None)
def _kp_table() -> np.ndarray:
    """[len(SUB_KS), NLIMBS+1] limbs of k*p for each k in SUB_KS."""
    rows = [
        [int(x) for x in _const_limbs(k * P, NLIMBS + 1)] for k in SUB_KS
    ]
    return np.asarray(rows, np.int32)


class Fq2Assembler:
    """Assemble an Fq2 op program with static bound tracking.

    Registers are Fq2 slots; bounds are per-component ints (value < bound).
    """

    def __init__(self, nreg: int):
        self.nreg = nreg
        self.prog: List[Tuple[int, int, int, int, int]] = []
        self.bound: List[Optional[int]] = [None] * nreg

    def _emit(self, op, dst, a, b=0, imm=0):
        self.prog.append((op, dst, a, b, imm))

    def set_bound(self, r, bound=2 * P):
        self.bound[r] = bound

    def _prep_to(self, r, limit):
        if self.bound[r] > limit:
            self._emit(OP_RED, r, r)
            self.bound[r] = 2 * P

    def mul(self, dst, a, b):
        self._prep_to(a, MUL_ENVELOPE)
        self._prep_to(b, MUL_ENVELOPE)
        self._emit(OP_MUL, dst, a, b)
        self.bound[dst] = 2 * P

    def sq(self, dst, a):
        self._prep_to(a, MUL_ENVELOPE)
        self._emit(OP_SQ, dst, a)
        self.bound[dst] = 2 * P

    def add(self, dst, a, b):
        self._emit(OP_ADD, dst, a, b)
        self.bound[dst] = self.bound[a] + self.bound[b]
        assert self.bound[dst] < (1 << 270)

    def sub(self, dst, a, b):
        need_k = -(-self.bound[b] // P)
        ki = next(i for i, k in enumerate(SUB_KS) if k >= need_k)
        self._emit(OP_SUB, dst, a, b, ki)
        self.bound[dst] = self.bound[a] + SUB_KS[ki] * P
        assert self.bound[dst] < (1 << 270)

    def scale(self, dst, a, s):
        assert 1 <= s <= 16
        self._emit(OP_SCALE, dst, a, 0, s)
        self.bound[dst] = self.bound[a] * s
        assert self.bound[dst] < (1 << 270)

    def red(self, r):
        self._emit(OP_RED, r, r)
        self.bound[r] = 2 * P

    def cap(self, r):
        if self.bound[r] > 2 * P:
            self.red(r)

    def mul_w6(self, dst, a):
        # xi * a = (9 c0 - c1 + kp) + (c0 + 9 c1) u; the kp offset index
        # rides in imm (same table as SUB), so no pre-reduction is needed
        # for any operand bound the SUB_KS table covers.
        need_k = -(-self.bound[a] // P)
        ki = next(i for i, k in enumerate(SUB_KS) if k >= need_k)
        b = self.bound[a]
        self._emit(OP_MULW6, dst, a, 0, ki)
        self.bound[dst] = max(9 * b + SUB_KS[ki] * P, 10 * b)
        assert self.bound[dst] < (1 << 270)

    def table(self) -> np.ndarray:
        return np.asarray(self.prog, np.int32)


# ---------------------------------------------------------------------------
# In-kernel executor
# ---------------------------------------------------------------------------


def _reg_read(regs, r):
    c0 = [regs[r, 0, l] for l in range(NLIMBS)]
    c1 = [regs[r, 1, l] for l in range(NLIMBS)]
    return c0, c1


def _reg_write(regs, r, c0, c1):
    for l in range(NLIMBS):
        regs[r, 0, l] = c0[l]
        regs[r, 1, l] = c1[l]


def run_program(prog_ref, n_ops: int, regs, kp_ref):
    """Execute ``n_ops`` instructions from prog_ref [n, 5] against the
    register file ref ``regs`` [NREG, 2, NLIMBS, 8, 128]."""

    def body(t, _):
        op = prog_ref[t, 0]
        dst = prog_ref[t, 1]
        a = prog_ref[t, 2]
        b = prog_ref[t, 3]
        imm = prog_ref[t, 4]

        @pl.when(op == OP_MUL)
        def _():
            av = _reg_read(regs, a)
            bv = _reg_read(regs, b)
            out = K.k2_mul(av, bv, bound=MUL_ENVELOPE)
            _reg_write(regs, dst, out[0], out[1])

        @pl.when(op == OP_SQ)
        def _():
            av = _reg_read(regs, a)
            out = K.k2_square_w(av, bound=MUL_ENVELOPE)
            _reg_write(regs, dst, out[0], out[1])

        @pl.when(op == OP_ADD)
        def _():
            a0, a1 = _reg_read(regs, a)
            b0, b1 = _reg_read(regs, b)
            _reg_write(regs, dst, K.k_add(a0, b0), K.k_add(a1, b1))

        @pl.when(op == OP_SUB)
        def _():
            a0, a1 = _reg_read(regs, a)
            b0, b1 = _reg_read(regs, b)
            zero = a0[0] - a0[0]
            kp = [kp_ref[imm, j] for j in range(NLIMBS + 1)]

            def dosub(x, y):
                xe = list(x) + [zero]
                ye = list(y) + [zero]
                t = [xe[i] - ye[i] + kp[i] for i in range(NLIMBS + 1)]
                return K.k_carry(t, 5)[:NLIMBS]

            _reg_write(regs, dst, dosub(a0, b0), dosub(a1, b1))

        @pl.when(op == OP_SCALE)
        def _():
            a0, a1 = _reg_read(regs, a)
            _reg_write(
                regs,
                dst,
                K.k_carry([x * imm for x in a0], 3),
                K.k_carry([x * imm for x in a1], 3),
            )

        @pl.when(op == OP_RED)
        def _():
            a0, a1 = _reg_read(regs, a)
            lb = NLIMBS * (MASK + 8) * MASK

            def red(x):
                return K.k_mont_reduce(
                    K.k_mul_const(x, ONE_MONT, K.WIDE), limb_bound=lb
                )

            _reg_write(regs, dst, red(a0), red(a1))

        @pl.when(op == OP_MULW6)
        def _():
            a0, a1 = _reg_read(regs, a)
            zero = a0[0] - a0[0]
            kp = [kp_ref[imm, j] for j in range(NLIMBS + 1)]
            t0 = [a0[i] * 9 for i in range(NLIMBS)] + [zero]
            a1e = list(a1) + [zero]
            s0 = [t0[i] - a1e[i] + kp[i] for i in range(NLIMBS + 1)]
            s0 = K.k_carry(s0, 4)[:NLIMBS]
            s1 = K.k_carry(
                [a0[i] + a1[i] * 9 for i in range(NLIMBS)], 2
            )
            _reg_write(regs, dst, s0, s1)

        return 0

    jax.lax.fori_loop(0, n_ops, body, 0)


# ---------------------------------------------------------------------------
# Generic single-shot VM runner
# ---------------------------------------------------------------------------


def _vm_kernel(n_ops, n_in, out_map, nreg, prog_ref, kp_ref, in_ref,
               out_ref, regs):
    for i in range(n_in):
        for c in range(2):
            for l in range(NLIMBS):
                regs[i, c, l] = in_ref[i, c, l]
    run_program(prog_ref, n_ops, regs, kp_ref)
    for j, r in enumerate(out_map):
        for c in range(2):
            for l in range(NLIMBS):
                out_ref[j, c, l] = regs[r, c, l]


def vm_apply(prog: np.ndarray, in_arr: jnp.ndarray, out_map, nreg: int,
             interpret=None) -> jnp.ndarray:
    """Run a program once per batch tile.

    in_arr: [n_in, 2, NLIMBS, R, 128]; registers 0..n_in-1 are preloaded
    with the inputs. Returns [len(out_map), 2, NLIMBS, R, 128] gathering
    the listed registers after execution.
    """
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    n_in = in_arr.shape[0]
    nrows = in_arr.shape[3]
    assert nrows % 8 == 0
    grid = (nrows // 8,)
    n_out = len(out_map)

    out = pl.pallas_call(
        partial(
            _vm_kernel, prog.shape[0], n_in, tuple(out_map), nreg
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_out, 2, NLIMBS, nrows, 128), jnp.int32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (n_in, 2, NLIMBS, 8, 128), lambda bt: (0, 0, 0, bt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_out, 2, NLIMBS, 8, 128), lambda bt: (0, 0, 0, bt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((nreg, 2, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(prog), jnp.asarray(_kp_table()), in_arr)
    return out


def _vm_kernel_stacked(n_ops, n_in, out_map, nreg, prog_ref, kp_ref, in_ref,
                       out_ref, regs):
    for i in range(n_in):
        for c in range(2):
            for l in range(NLIMBS):
                regs[i, c, l] = in_ref[0, i, c, l]
    run_program(prog_ref, n_ops, regs, kp_ref)
    for j, r in enumerate(out_map):
        for c in range(2):
            for l in range(NLIMBS):
                out_ref[0, j, c, l] = regs[r, c, l]


def vm_apply_stacked(prog: np.ndarray, in_arr: jnp.ndarray, out_map,
                     nreg: int, interpret=None) -> jnp.ndarray:
    """Run a program once per (batch tile, stack entry).

    in_arr: [S, n_in, 2, NLIMBS, R, 128] — one independent program run per
    stack entry s (registers 0..n_in-1 preloaded from in_arr[s]). Returns
    [S, len(out_map), 2, NLIMBS, R, 128]. Used for per-state maps over a
    trajectory stack (e.g. the witness path's Jacobian->affine export).
    """
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    S, n_in = in_arr.shape[0], in_arr.shape[1]
    nrows = in_arr.shape[4]
    assert nrows % 8 == 0
    grid = (nrows // 8, S)
    n_out = len(out_map)

    out = pl.pallas_call(
        partial(
            _vm_kernel_stacked, prog.shape[0], n_in, tuple(out_map), nreg
        ),
        out_shape=jax.ShapeDtypeStruct(
            (S, n_out, 2, NLIMBS, nrows, 128), jnp.int32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, n_in, 2, NLIMBS, 8, 128),
                lambda bt, s: (s, 0, 0, 0, bt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_out, 2, NLIMBS, 8, 128),
            lambda bt, s: (s, 0, 0, 0, bt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((nreg, 2, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(prog), jnp.asarray(_kp_table()), in_arr)
    return out


# ---------------------------------------------------------------------------
# Host-side layout helpers for vm_apply
# ---------------------------------------------------------------------------


def fp2s_to_vm(fp2_list):
    """List of Fp2 (shared batch shape) -> ([n, 2, L, R, 128], batch, pad)."""
    from ..fields import fp as F

    rows = []
    batch = None
    for x in fp2_list:
        c0 = F._cap_2p(x.c0).limbs
        c1 = F._cap_2p(x.c1).limbs
        batch = c0.shape[:-1]
        rows.append(jnp.stack([c0.reshape(-1, NLIMBS), c1.reshape(-1, NLIMBS)]))
    arr = jnp.stack(rows)  # [n, 2, B, L]
    b = arr.shape[2]
    pad = (-b) % 1024
    if pad:
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nb = arr.shape[2]
    out = jnp.moveaxis(arr, -1, 2).reshape(len(fp2_list), 2, NLIMBS, nb // 128, 128)
    return out, batch, pad


def vm_to_fp2s(arr, batch, pad):
    """[n, 2, L, R, 128] -> list of Fp2 with the given batch shape."""
    from ..fields import fp as F
    from ..fields.fp2 import Fp2

    n = arr.shape[0]
    nb = arr.shape[3] * 128
    flat = jnp.moveaxis(arr.reshape(n, 2, NLIMBS, nb), 2, -1)  # [n, 2, B, L]
    if pad:
        flat = flat[:, :, : nb - pad]
    out = []
    for i in range(n):
        c0 = flat[i, 0].reshape(batch + (NLIMBS,))
        c1 = flat[i, 1].reshape(batch + (NLIMBS,))
        out.append(Fp2(F.Fp(c0, 2 * P, F.SETTLED), F.Fp(c1, 2 * P, F.SETTLED)))
    return out
