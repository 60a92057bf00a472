"""Top-level pairing façade (reference: src/pairing.rs:20-38).

``pairing(p, q)`` composes the Miller loop and final exponentiation, fully
batched: p/q carry arbitrary leading batch dimensions and the result is the
batch of Fq12 pairing values, bit-exact (canonical limbs) with the
reference's ``pairing()``.
"""

from __future__ import annotations

from ..curves.g1 import G1
from ..curves.g2 import G2
from ..fields.fp12 import Fq12
from .final_exp import final_exp
from .miller_loop import miller_loop, multi_miller_loop


def pairing(p: G1, q: G2) -> Fq12:
    """e(P, Q) = final_exp(miller_loop(Q, P)); batched."""
    return final_exp(miller_loop(q, p))


def multi_pairing(ps: G1, qs: G2) -> Fq12:
    """prod_k e(P_k, Q_k) with one shared final exponentiation
    (Groth16-verification shape); leading axis of ps/qs is the pair axis."""
    return final_exp(multi_miller_loop(qs, ps))
