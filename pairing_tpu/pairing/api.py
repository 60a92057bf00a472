"""Top-level pairing façade (reference: src/pairing.rs:20-38).

``pairing(p, q)`` composes the Miller loop and final exponentiation, fully
batched: p/q carry arbitrary leading batch dimensions and the result is the
batch of Fq12 pairing values, bit-exact (canonical limbs) with the
reference's ``pairing()``.

On the Pallas backend the whole pipeline is kernel-layout resident: the
Miller accumulator, epilogue multiplies, and the entire final
exponentiation chain run on ``[12, NLIMBS, R, 128]`` arrays with a single
layout conversion at the very end.
"""

from __future__ import annotations

from ..curves.g1 import G1
from ..curves.g2 import G2
from ..fields.fp12 import Fq12
from .final_exp import final_exp, final_exp_k
from .miller_loop import miller_loop, miller_loop_k, multi_miller_loop


def pairing(p: G1, q: G2) -> Fq12:
    """e(P, Q) = final_exp(miller_loop(Q, P)); batched."""
    from ..ops import dispatch

    if dispatch.use_pallas():
        from ..ops.fq12_kernels import from_kernel_layout

        f_arr, batch, pad = miller_loop_k(q, p)
        return from_kernel_layout(final_exp_k(f_arr), batch, pad)
    return final_exp(miller_loop(q, p))


def multi_pairing(ps: G1, qs: G2) -> Fq12:
    """prod_k e(P_k, Q_k) with one shared final exponentiation
    (Groth16-verification shape, BASELINE config 2); leading axis of
    ps/qs is the pair axis K. On the Pallas backend the Miller product
    stays kernel-layout resident straight into the final-exp chain."""
    from ..ops import dispatch

    if dispatch.use_pallas():
        from ..ops.fq12_kernels import from_kernel_layout
        from .miller_loop import multi_miller_loop_k

        f_arr, batch, pad = multi_miller_loop_k(qs, ps)
        return from_kernel_layout(final_exp_k(f_arr), batch, pad)
    return final_exp(multi_miller_loop(qs, ps))


def validate_inputs(p: G1, q: G2, subgroup_check: bool = True):
    """Batched input validation mask for ``pairing(p, q)``.

    Returns bool [batch]: True iff P is on E (which rejects the (0,0)
    infinity encoding, since b != 0), Q is on the twist, and — with
    ``subgroup_check`` — Q lies in the r-torsion subgroup G2
    (``curves.g2.g2_in_subgroup``; ~189 curve ops per lane, so gate it
    off for trusted inputs). G1 needs no subgroup check: the BN254 G1
    cofactor is 1, so every curve point qualifies. The pairing itself
    assumes validated inputs (the reference is equally trusting:
    miller_loop_native.rs performs no checks); on invalid points its
    output is unspecified.
    """
    from ..curves.g1 import g1_on_curve
    from ..curves.g2 import g2_in_subgroup, g2_on_curve

    ok = g1_on_curve(p) & g2_on_curve(q)
    if subgroup_check:
        ok = ok & g2_in_subgroup(q)
    return ok
