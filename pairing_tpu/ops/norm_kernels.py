"""Pallas kernels for bulk Jacobian->affine normalization (Phase N).

Montgomery's batch-inversion trick over the trajectory stack needs two
sequential passes of Fq2 multiplies along the stack axis (prefix products
forward, running-inverse backward). As XLA scans these pay per-step op
overheads; here each pass is a pallas grid over (batch_tile, stack pos)
with the running product resident in VMEM and one k2_mul (fwd) or two
(bwd) per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp import NLIMBS, R_MOD_P, _const_limbs
from . import kernel_core as K

ONE_MONT = [int(x) for x in _const_limbs(R_MOD_P)]


def _read2(ref):
    return ([ref[0, l] for l in range(NLIMBS)], [ref[1, l] for l in range(NLIMBS)])


def _read2_at(ref, i0):
    return (
        [ref[i0, 0, l] for l in range(NLIMBS)],
        [ref[i0, 1, l] for l in range(NLIMBS)],
    )


def _write2(ref, v):
    for l in range(NLIMBS):
        ref[0, l] = v[0][l]
        ref[1, l] = v[1][l]


def _write2_at(ref, i0, v):
    for l in range(NLIMBS):
        ref[i0, 0, l] = v[0][l]
        ref[i0, 1, l] = v[1][l]


def _fwd_kernel(n, z_bound, z_ref, prefix_ref, total_ref, carry):
    t = pl.program_id(1)
    zero = z_ref[0, 0, 0] * 0

    @pl.when(t == 0)
    def _():
        for l in range(NLIMBS):
            carry[0, l] = zero + ONE_MONT[l]
            carry[1, l] = zero

    c = _read2(carry)
    _write2_at(prefix_ref, 0, c)
    z = _read2_at(z_ref, 0)
    nc = K.k2_mul(c, z, bound=z_bound)
    _write2(carry, nc)

    @pl.when(t == n - 1)
    def _():
        v = _read2(carry)
        for l in range(NLIMBS):
            total_ref[0, l] = v[0][l]
            total_ref[1, l] = v[1][l]


def _bwd_kernel(n, z_bound, z_ref, prefix_ref, tinv_ref, zinv_ref, carry):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for l in range(NLIMBS):
            carry[0, l] = tinv_ref[0, l]
            carry[1, l] = tinv_ref[1, l]

    c = _read2(carry)
    pre = _read2_at(prefix_ref, 0)
    _write2_at(zinv_ref, 0, K.k2_mul(c, pre))
    z = _read2_at(z_ref, 0)
    _write2(carry, K.k2_mul(c, z, bound=z_bound))


def prefix_products_pallas(z_arr: jnp.ndarray, interpret=None,
                           z_bound: int = 0):
    """z_arr: [N, 2, NLIMBS, R, 128] Fq2 stack -> (prefix [N,...], total).

    prefix[i] = prod z[0..i-1] (prefix[0] = 1). ``z_bound``: static value
    bound of the z entries (0 -> the standard 4p envelope); redundant
    trajectory states (see curve_kernels.trajectory_bounds) pass theirs.
    """
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    from ..utils.bn254 import P as _P

    z_bound = z_bound or 4 * _P
    n = z_arr.shape[0]
    nrows = z_arr.shape[3]
    grid = (nrows // 8, n)
    step_block = pl.BlockSpec(
        (1, 2, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    fixed = pl.BlockSpec(
        (2, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    prefix, total = pl.pallas_call(
        partial(_fwd_kernel, n, z_bound),
        out_shape=(
            jax.ShapeDtypeStruct(z_arr.shape, jnp.int32),
            jax.ShapeDtypeStruct((2, NLIMBS, nrows, 128), jnp.int32),
        ),
        grid=grid,
        in_specs=[step_block],
        out_specs=(step_block, fixed),
        scratch_shapes=[pltpu.VMEM((2, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(z_arr)
    return prefix, total


def running_inverse_pallas(
    z_arr: jnp.ndarray, prefix: jnp.ndarray, tinv: jnp.ndarray,
    interpret=None, z_bound: int = 0
):
    """Backward pass: zinv[i] = inv(z[0..N-1] prod) * suffix... i.e. the
    per-element inverses given total-inverse ``tinv``."""
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    from ..utils.bn254 import P as _P

    z_bound = z_bound or 4 * _P
    n = z_arr.shape[0]
    nrows = z_arr.shape[3]
    grid = (nrows // 8, n)
    rev_block = pl.BlockSpec(
        (1, 2, NLIMBS, 8, 128),
        lambda bt, t: (n - 1 - t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    fixed = pl.BlockSpec(
        (2, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )
    zinv = pl.pallas_call(
        partial(_bwd_kernel, n, z_bound),
        out_shape=jax.ShapeDtypeStruct(z_arr.shape, jnp.int32),
        grid=grid,
        in_specs=[rev_block, rev_block, fixed],
        out_specs=rev_block,
        scratch_shapes=[pltpu.VMEM((2, NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(z_arr, prefix, tinv)
    return zinv
