"""Pallas kernels for base-field (Fq) ladders.

``fp_pow_bits_pallas``: fixed-exponent square-and-multiply on a batch of
Fq elements with the accumulator resident in VMEM — used for Fermat
inversions (a^(p-2)), which are 253-step sequential chains that the XLA
path executes as hundreds of tiny HBM-bound ops.
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


def _pow_kernel(n_steps, bits_ref, a_ref, out_ref, res):
    t = pl.program_id(1)
    zero = a_ref[0] * 0

    @pl.when(t == 0)
    def _():
        for l in range(NLIMBS):
            res[l] = a_ref[l]

    r = [res[l] for l in range(NLIMBS)]
    r = K.k_mont_mul(r, r)
    bit = bits_ref[t]
    a = [a_ref[l] for l in range(NLIMBS)]
    one = [zero + ONE_MONT[l] for l in range(NLIMBS)]
    mult = K.k_select(bit == 1, a, one)
    r = K.k_mont_mul(r, mult)
    for l in range(NLIMBS):
        res[l] = r[l]

    @pl.when(t == n_steps - 1)
    def _():
        for l in range(NLIMBS):
            out_ref[l] = res[l]


def fp_pow_bits_pallas(a_arr: jnp.ndarray, e: int, interpret=None) -> jnp.ndarray:
    """a^e (static exponent) in kernel layout [NLIMBS, R, 128].

    Montgomery domain in/out; operand envelope (2p, settled).
    """
    if interpret is None:
        from .fq12_kernels import on_tpu

        interpret = not on_tpu()
    bits = np.asarray([int(b) for b in bin(e)[2:]], np.int32)[1:]
    n_steps = len(bits)
    nrows = a_arr.shape[1]
    assert nrows % 8 == 0
    grid = (nrows // 8, n_steps)

    block = pl.BlockSpec(
        (NLIMBS, 8, 128), lambda bt, t: (0, bt, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_pow_kernel, n_steps),
        out_shape=jax.ShapeDtypeStruct(a_arr.shape, jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), block],
        out_specs=block,
        scratch_shapes=[pltpu.VMEM((NLIMBS, 8, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(bits), a_arr)
    return out


def fp_to_kernel_layout(limbs: jnp.ndarray):
    """[..., NLIMBS] -> ([NLIMBS, R, 128], batch_shape, pad)."""
    batch_shape = limbs.shape[:-1]
    flat = limbs.reshape(-1, NLIMBS)
    b = flat.shape[0]
    pad = (-b) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    n = flat.shape[0]
    return jnp.moveaxis(flat, -1, 0).reshape(NLIMBS, n // 128, 128), batch_shape, pad


def fp_from_kernel_layout(arr: jnp.ndarray, batch_shape, pad: int) -> jnp.ndarray:
    n = arr.shape[1] * 128
    flat = jnp.moveaxis(arr.reshape(NLIMBS, n), 0, -1)
    if pad:
        flat = flat[: n - pad]
    return flat.reshape(tuple(batch_shape) + (NLIMBS,))
