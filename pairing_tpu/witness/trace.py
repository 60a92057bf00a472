"""Batched witness generation for in-circuit pairing checks.

The reference's circuit side (miller_loop_target.rs / final_exp_target.rs)
re-expresses the pairing as constraint emission over wire values; the wire
*values* are exactly the intermediate values of the native algorithm. The
TPU analogue (SURVEY.md §7.1, BASELINE config 4) generates those
intermediate values — per-iteration f, the affine R trajectory, all line
coefficients, and the x-power ladder rows — as batched arrays, so a
downstream proof system can constrain each transition without re-running
the pairing.

``fq12_exp_u64`` mirrors the STARK offload component C12
(starky-bn254 ``fq12_exp_u64_circuit``, final_exp_target.rs:89-147): a
batch of {x, offset, exp_val} inputs evaluated as offset * x^exp_val with
*runtime* u64 exponents, emitting the per-bit ladder trace that the AIR
would constrain.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.g1 import G1
from ..curves.g2 import G2
from ..fields import fp2 as F2
from ..fields import fp12 as F12
from ..fields.fp12 import Fq12
from ..pairing import final_exp as FE
from ..pairing.miller_loop import (
    _fq12_from_limbs,
    _fq12_to_limbs,
    _miller_core,
    _add_pairs_axis,
    fq12_cap,
)


def miller_loop_witness(q: G2, p: G1) -> Tuple[Fq12, Dict]:
    """Single-pair Miller loop + full witness trace."""
    return _miller_core(_add_pairs_axis(q), _add_pairs_axis(p), collect_trace=True)


def multi_miller_loop_witness(qs: G2, ps: G1) -> Tuple[Fq12, Dict]:
    return _miller_core(qs, ps, collect_trace=True)


# ---------------------------------------------------------------------------
# Fq12 exponentiation offload (C12 analogue)
# ---------------------------------------------------------------------------


class ExpU64Input(NamedTuple):
    """Mirror of starky-bn254's Fq12ExpU64InputTarget {x, offset, exp_val}.

    ``exp_bits``: int32 bit array [..., 64], LSB first (JAX default config
    has no 64-bit ints; the bit decomposition is also exactly what the AIR
    constrains). Use :func:`exp_bits_from_u64` to build it.
    """

    x: Fq12
    offset: Fq12
    exp_bits: jnp.ndarray


def exp_bits_from_u64(values, batch_shape=()) -> jnp.ndarray:
    """Host u64 ints -> [..., 64] int32 LSB-first bit array."""
    arr = np.asarray(
        [[(int(v) >> i) & 1 for i in range(64)] for v in np.atleast_1d(values)],
        dtype=np.int32,
    )
    if np.isscalar(values) or np.ndim(values) == 0:
        arr = arr[0]
    out = jnp.asarray(arr)
    if batch_shape:
        out = jnp.broadcast_to(out, tuple(batch_shape) + (64,))
    return out


def fq12_exp_u64(inp: ExpU64Input, collect_trace: bool = False):
    """offset * x^exp with runtime 64-bit exponents (MSB-first ladder).

    Branchless: each of 64 steps squares and multiplies by x or one
    depending on the exponent bit (leading zero bits are no-ops since res
    starts at one). Returns (out, trace_rows) where trace_rows stacks the
    per-bit ladder state — the rows a STARK AIR would constrain
    (final_exp_target.rs:141).
    """
    x = fq12_cap(inp.x)
    one = fq12_cap(F12.fq12_one(x.batch_shape))
    inner = x.batch_shape

    # [..., 64] LSB-first -> scan over MSB-first [64, ...]
    bits_msb = jnp.moveaxis(inp.exp_bits[..., ::-1], -1, 0)

    def body(res_l, bit):
        res = _fq12_from_limbs(res_l)
        res = F12.fq12_sq(res)
        mult = F12.fq12_select(jnp.broadcast_to(bit == 1, inner), x, one)
        res = F12.fq12_mul(res, mult)
        out_l = _fq12_to_limbs(fq12_cap(res))
        return out_l, (out_l if collect_trace else None)

    res_l, rows = jax.lax.scan(body, _fq12_to_limbs(one), bits_msb)
    out = F12.fq12_mul(fq12_cap(inp.offset), _fq12_from_limbs(res_l))
    return fq12_cap(out), rows


def final_exp_witness(m: Fq12) -> Tuple[Fq12, Dict]:
    """Final exponentiation + witness trace.

    Follows the circuit-side structure (final_exp_target.rs:65-150): the
    three x-power exponentiations are routed through the batched
    exp offload (inputs recorded like Fq12ExpU64InputTarget), everything
    else is the easy/hard-part chain. On the Pallas backend the whole
    thing is kernel-resident (the bit-ladder rows stream out of a fused
    kernel); elsewhere it runs the XLA ``fq12_exp_u64`` scans.
    """
    from ..ops import dispatch

    if dispatch.use_pallas():
        from ..ops.fq12_kernels import to_kernel_layout

        arr, bs, pad = to_kernel_layout(fq12_cap(m))
        return final_exp_witness_k(arr, bs, pad)
    return _final_exp_witness_xla(m)


def final_exp_witness_k(arr, bs, pad) -> Tuple[Fq12, Dict]:
    """Kernel-resident final-exp witness: easy part, three bit-ladder
    exp offloads with per-row collection (the C12 AIR rows,
    final_exp_target.rs:89-147), and the hard-part chain — all on the
    kernel layout; one layout conversion per trace array at the end."""
    from ..ops.fq12_kernels import from_kernel_layout
    from ..ops.fused_kernels import BN_X_BITS_MSB, exp_bits_ladder_pallas
    from ..pairing.final_exp import easy_part_k, hard_part_chain_k
    from ..pairing.miller_loop import _k_to_comps

    f0 = easy_part_k(arr)
    mx, rows0 = exp_bits_ladder_pallas(f0, BN_X_BITS_MSB)
    mx2, rows1 = exp_bits_ladder_pallas(mx, BN_X_BITS_MSB)
    mx3, rows2 = exp_bits_ladder_pallas(mx2, BN_X_BITS_MSB)
    out_arr = hard_part_chain_k(f0, mx, mx2, mx3)

    back = lambda a: from_kernel_layout(a, bs, pad)

    def rows_tree(rows):
        c12 = _k_to_comps(rows, (rows.shape[0],), bs, pad)
        return tuple((c12[2 * i], c12[2 * i + 1]) for i in range(6))

    f0_f = back(f0)
    mxs = (back(mx), back(mx2), back(mx3))
    exp_bits = exp_bits_from_u64(_bn_x(), bs)
    one = F12.fq12_one(bs)
    trace = {
        "easy_part_out": f0_f,
        "exp_inputs": [
            ExpU64Input(x=v, offset=one, exp_bits=exp_bits)
            for v in (f0_f, mxs[0], mxs[1])
        ],
        "exp_trace_rows": [rows_tree(r) for r in (rows0, rows1, rows2)],
        "exp_outputs": mxs,
    }
    return back(out_arr), trace


def _final_exp_witness_xla(m: Fq12) -> Tuple[Fq12, Dict]:
    f0 = FE.easy_part(m)

    exp_bits = exp_bits_from_u64(_bn_x(), f0.batch_shape)
    one = F12.fq12_one(f0.batch_shape)

    exp_inputs = []
    exp_rows = []

    def pow_off(v: Fq12) -> Fq12:
        inp = ExpU64Input(x=v, offset=one, exp_bits=exp_bits)
        out, rows = fq12_exp_u64(inp, collect_trace=True)
        exp_inputs.append(inp)
        exp_rows.append(rows)
        return out

    mul, conj, frob = F12.fq12_mul, F12.conjugate, F12.frobenius_map
    mp, mp2, mp3 = frob(f0, 1), frob(f0, 2), frob(f0, 3)
    y0 = mul(mp, mul(mp2, mp3))
    y1 = conj(f0)
    mx = pow_off(f0)
    mxp = frob(mx, 1)
    mx2 = pow_off(mx)
    mx2p = frob(mx2, 1)
    y2 = frob(mx2, 2)
    y5 = conj(mx2)
    mx3 = pow_off(mx2)
    mx3p = frob(mx3, 1)
    y3 = conj(mxp)
    y4 = conj(mul(mx, mx2p))
    y6 = conj(mul(mx3, mx3p))

    t0 = mul(mul(F12.fq12_sq(y6), y4), y5)
    t1 = mul(y3, y5)
    t1 = mul(t1, t0)
    t0 = mul(y2, t0)
    t1 = F12.fq12_sq(t1)
    t1 = mul(t1, t0)
    t1 = F12.fq12_sq(t1)
    t0 = mul(t1, y1)
    t1 = mul(t1, y0)
    t0 = F12.fq12_sq(t0)
    out = mul(t0, t1)

    trace = {
        "easy_part_out": f0,
        "exp_inputs": exp_inputs,  # 3 x {x, offset, exp_val}
        "exp_trace_rows": exp_rows,  # 3 x per-bit ladder rows [64, ...]
        "exp_outputs": (mx, mx2, mx3),
    }
    return fq12_cap(out), trace


def pairing_witness(p: G1, q: G2) -> Tuple[Fq12, Dict]:
    """pairing_circuit analogue (pairing.rs:24-38): full pairing + traces.

    On the Pallas backend the Miller output stays in the kernel layout
    between the two stages (no transpose round-trip); the trace arrays
    themselves are converted once at the end of each stage."""
    return multi_pairing_witness(_add_pairs_axis(p), _add_pairs_axis(q))


def multi_pairing_witness(ps: G1, qs: G2) -> Tuple[Fq12, Dict]:
    """Groth16-shape witness: the product of K pairings with shared
    squarings (multi_miller_loop_BN_native, miller_loop_native.rs:192)
    and ONE final exponentiation, with the full per-transition trace —
    what an in-circuit product-of-pairings check (the Groth16 verifier
    shape, SURVEY.md §3.4) would constrain. ``ps``/``qs`` carry a leading
    pairs axis K."""
    from ..ops import dispatch

    res = _miller_core(
        qs, ps, collect_trace=True, keep_k=dispatch.use_pallas(),
    )
    result, mtrace = res
    if isinstance(result, tuple):
        from ..ops.fq12_kernels import from_kernel_layout

        f_arr, inner, pad = result
        f = from_kernel_layout(f_arr, inner, pad)
        out, ftrace = final_exp_witness_k(f_arr, inner, pad)
    else:
        f = result
        out, ftrace = final_exp_witness(f)
    return out, {"miller": mtrace, "final_exp": ftrace, "miller_out": f}


def _bn_x() -> int:
    from ..utils.bn254 import BN_X

    return BN_X
