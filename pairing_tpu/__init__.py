"""pairing_tpu — a TPU-native BN254 optimal-ate pairing framework.

A from-scratch JAX/Pallas re-design of the capability surface of
qope/plonky2-bn254-pairing (see SURVEY.md): batched pairing evaluation,
multi-Miller products with shared squarings, final exponentiation,
witness-trace generation for in-circuit pairing checks, and mesh-sharded
multi-chip execution with a multiplicative Fq12 all-reduce.

Public API map (reference parity in parentheses):
  pairing, multi_pairing            (pairing.rs pairing / Groth16 shape)
  miller_loop, multi_miller_loop    (miller_loop_native.rs)
  final_exp                         (final_exp_native.rs)
  witness.trace.pairing_witness     (pairing_circuit semantics)
  witness.trace.fq12_exp_u64        (starky fq12_exp_u64_circuit shape)
  parallel.mesh                     (P1-P5 parallelism, SURVEY.md §2.4)
  oracle.native                     (arkworks-equivalent int oracle)
"""

from .curves.g1 import G1, g1_from_ints, g1_neg, g1_on_curve, g1_to_ints
from .curves.g2 import (
    G2,
    g2_from_ints,
    g2_in_subgroup,
    g2_neg,
    g2_on_curve,
    g2_to_ints,
    neg_twisted_frobenius,
    twisted_frobenius,
)
from .fields.fp12 import (
    Fq12,
    fq12_from_int_coeffs,
    fq12_to_int_coeffs,
)
from .pairing.api import multi_pairing, pairing, validate_inputs
from .pairing.final_exp import final_exp
from .pairing.miller_loop import miller_loop, multi_miller_loop

__version__ = "0.1.0"

__all__ = [
    "G1",
    "G2",
    "Fq12",
    "pairing",
    "multi_pairing",
    "miller_loop",
    "multi_miller_loop",
    "final_exp",
    "g1_from_ints",
    "g1_to_ints",
    "g1_neg",
    "g1_on_curve",
    "g2_from_ints",
    "g2_to_ints",
    "g2_neg",
    "g2_on_curve",
    "g2_in_subgroup",
    "validate_inputs",
    "twisted_frobenius",
    "neg_twisted_frobenius",
    "fq12_from_int_coeffs",
    "fq12_to_int_coeffs",
]
