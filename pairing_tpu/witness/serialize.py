"""Serialized witness-trace format (npz) + loader.

The reference's target side materializes an actual constraint system
(`pairing_circuit`, pairing.rs:24-38); BASELINE config 4 replaces that
with witness *traces* a downstream prover consumes. This module gives
those traces a stable on-disk format; :mod:`pairing_tpu.witness.verify`
is the independent replay-checker (the `Fq12Target::connect` analogue,
final_exp_target.rs:142-147).

Format: one ``.npz`` with a ``meta`` JSON entry and int32 limb arrays.

Conventions
-----------
* Every field element is radix-``2^13``, 21-limb int32, **Montgomery
  domain** (value = limbs · R^-1 mod p, R = 2^273), redundant (< 2p).
  ``meta`` records all constants so a consumer needs no other source.
* Fq2 values carry a trailing ``[2, L]`` (c0, c1); Fq12 values a trailing
  ``[12, L]`` in the reference's ``MyFq12.coeffs`` order (coeffs[i] =
  slot-i real part, coeffs[i+6] = slot-i u part; SURVEY.md §2.2).
* ``B`` is the flattened batch; ``K`` the multi-pairing pairs axis.

Entries
-------
  meta                 JSON: version, nlimbs, radix_bits, p, r_mont,
                       domain, batch_shape, k, naf (65 signed digits),
                       add_steps, bn_x
  p_x, p_y             [K, B, L]       G1 inputs
  q_x, q_y             [K, B, 2, L]    G2 inputs
  r_affine_x/_y        [130, K, B, 2, L]  normalized trajectory: states
                       0..63 loop-top, 64..127 post-double, 128 end,
                       129 end+Q1 (miller_loop.py phase N stack order)
  tg_lines             [64, K, B, 3, 2, L]  tangent coeffs (slots 0,3,4)
  ch_lines             [n_adds, K, B, 3, 2, L] chord coeffs (slots 2,3,5),
                       row j belongs to Miller step meta.add_steps[j]
  ep_lines             [2, K, B, 3, 2, L]  epilogue chords (end,Q1),
                       (end+Q1, -Q2)
  q1_x/_y, nq2_x/_y    [K, B, 2, L]    twisted-Frobenius points
  f_steps              [64, B, 12, L]  Miller accumulator after each step
  miller_out           [B, 12, L]
  easy_out             [B, 12, L]      easy-part output
  exp_bits             [64]            BN_X bits, LSB first (shared)
  exp_rows             [3, 64, B, 12, L]  x-power ladder rows (C12 shape)
  exp_outs             [3, B, 12, L]   mx, mx2, mx3
  final_out            [B, 12, L]      pairing result

Aux (prover-committed) entries — schema v2
------------------------------------------
The witness generator also commits every auxiliary wire an AIR needs, so
the npz is a SELF-CONTAINED trace (the reference's fill-all-wires model,
pairing.rs:77-78) and the constraint evaluator does no derivation. See
:mod:`pairing_tpu.witness.aux` for shapes and exact semantics:
``tg_lambda``, ``tg_sqx``, ``ch_mu``, ``ep_mu`` (slope / square helper
wires of rules 1-2), ``f_sq``, ``f_mid``, ``ep_mid`` (Miller chain
intermediates of rule 3), ``inv_m``, ``easy_mid``, ``easy_frob`` (rule
4), ``exp_sq`` (rule 5 ladder squares), ``hard_frob``, ``hard_mid``
(rule 6 chain).

Constraint schema (what a downstream AIR enforces per transition)
------------------------------------------------------------------
This section is the circuit-side contract — the polynomial identities a
starky-style AIR (or any non-native-arithmetic constraint system) checks
over these columns, mirroring what `pairing_circuit` emits as plonky2
gates (miller_loop_target.rs:132-311, final_exp_target.rs:65-150) and
what `fq12_exp_u64_circuit`'s AIR enforces per row
(final_exp_target.rs:89-147). `witness/verify.py` is the executable
reference implementation of every rule below (the `connect` analogue).

Value semantics: every limb vector encodes value = Σ limbs[i]·2^13i,
interpreted mod p in the Montgomery domain (witness value v stands for
v·R⁻¹ mod p). All identities below are over Fq12/Fq2 VALUES mod p; a
limb-level AIR realizes each product a·b = c as the non-native
Montgomery-mul relation a·b = c·R + q·p with range-checked limbs — the
same gadget family as the reference's FqTarget mul (C9). Montgomery form
is multiplicative, so the identities are form-invariant: with all three
operands in Montgomery form, `mont_mul(a, b) = a∘b` represents the
product exactly.

Notation: d_t = meta.naf[63-t] (the Miller digit of step t, t = 0..63),
T_t = r_affine[t] (loop-top state), D_t = r_affine[64+t] (post-double
state), E = r_affine[128] (end), S = r_affine[129] (end+Q1),
ℓ034(c) / ℓ235(c) = the sparse Fq12 with slots {0,3,4} / {2,3,5} taken
from a 3×Fq2 coefficient row c.

1. Point-trajectory transitions (G2 doubling/mixed-add in affine):
   * doubling    D_t = 2·T_t:  with λ_t = 3·T_t.x² / (2·T_t.y):
       (a) λ_t·(2·T_t.y) = 3·T_t.x²            [one Fq2 mul identity]
       (b) D_t.x = λ_t² − 2·T_t.x
       (c) D_t.y = λ_t·(T_t.x − D_t.x) − T_t.y
     (the AIR introduces λ_t as an auxiliary column; verify.py
     recomputes the double directly instead.)
   * addition    T_{t+1} = D_t + sgn(d_t)·Q when d_t ≠ 0, else
     T_{t+1} = D_t: same three identities with the chord slope
     μ_t = (D_t.y − sgn(d_t)·Q.y) / (D_t.x − Q.x).
   * boundary    T_0 = Q (the G2 input).
   * epilogue    Q1 = twisted_frobenius(Q), −Q2 = neg_twisted_frobenius
     (Q1) (coefficient-wise Frobenius constants, miller_loop_native.rs:
     298-312); S = E + Q1 (mixed add, same identities as above; E and S
     are carried in the SAME normalized stack, so both are affine).

2. Tangent/chord line coefficients (sparse_line_function_{equal,
   unequal}_native, miller_loop_native.rs:10-44):
   * tg_lines[t] = (c0, c3, c4) with, at R = T_t, P = (p_x, p_y):
       c0 = ξ·(3·R.x³ − 2·R.y²)     [ξ = 9 + u]
       c3 = 2·R.y·p_y               [Fq2 × Fq scalar]
       c4 = −3·R.x²·p_x
   * ch_lines[j] (step t = meta.add_steps[j]) = (c2, c3, c5) with
     A = D_t, B = sgn(d_t)·Q:
       c2 = (B.x − A.x)·p_y
       c3 = (A.y − B.y)·p_x
       c5 = A.x·B.y − B.x·A.y
   * ep_lines[0] likewise for (A, B) = (E, Q1); ep_lines[1] for
     (A, B) = (S, −Q2).

3. Miller accumulator transitions (f_steps; miller_loop_native.rs:
   151-173 with the f² folded into step 0 against f_{-1} = 1):
       f_0 = ℓ034(tg_lines[0]) · ℓ235(ch_lines[j(0)])^{[d_0≠0]}
       f_t = f_{t-1}² · ℓ034(tg_lines[t]) · ℓ235(ch_lines[j(t)])^{[d_t≠0]}
     where j(t) = index of t in meta.add_steps. For K > 1 (multi-
     pairing) ONE squaring is shared: f_t = f_{t-1}² · Π_k ℓ034^k ·
     Π_k ℓ235^k (miller_loop_native.rs:239).
       miller_out = f_63 · ℓ235(ep_lines[0])·…·ℓ235(ep_lines[1])
     (per pair, in pair order — the two Frobenius lines,
     miller_loop_native.rs:274-280).

4. Easy part (final_exp_native.rs:195-206): introduce the inverse as a
   witness column i with m·i = 1 (m = miller_out); then
       easy_out = frob²(conj(m)·i) · (conj(m)·i)
   conj is slot-sign flips (free), frob² is 6 constant Fq2 muls.

5. Exp-offload rows (the C12 AIR, final_exp_target.rs:89-147): for each
   of the 3 ladders r ∈ {0,1,2} with base x_r ∈ {easy_out, exp_outs[0],
   exp_outs[1]} and MSB-first bits b_s = exp_bits[63-s]:
       row_0 = x_r^{b_0}                      (r_{-1} = 1 start)
       row_s = row_{s-1}² · x_r^{b_s}         (s = 1..63)
       exp_outs[r] = offset · row_63          (offset = 1 here)
   The b_s are 0/1-constrained and their recomposition Σ b_i·2^i =
   meta.bn_x is a public-input check.

6. Hard part (final_exp_native.rs:130-169): the 13-mul/4-conj/3-frob
   accumulation chain from {easy_out, exp_outs, frob powers} to
   final_out is a fixed dataflow of dense Fq12 muls — each a plain
   product constraint; verify.py replays it term-for-term.
"""

from __future__ import annotations

import json
from typing import Dict, Tuple

import numpy as np

from ..curves.g1 import G1
from ..curves.g2 import G2
from ..fields import fp as F
from ..fields.fp12 import Fq12
from ..utils.bn254 import BN_X, P, SIX_U_PLUS_2_NAF
from ..pairing.miller_loop import ADD_STEPS, N_STEPS

FORMAT_VERSION = 2


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int32)


def _fp_arr(v) -> np.ndarray:
    """Fp batch [...] -> [..., L] (limbs last already)."""
    return _np(F._cap_2p(v).limbs)


def _fp2_arr(v) -> np.ndarray:
    """Fp2 batch [...] -> [..., 2, L]."""
    return np.stack([_fp_arr(v.c0), _fp_arr(v.c1)], axis=-2)


def _fq12_arr(a: Fq12) -> np.ndarray:
    """Fq12 batch [...] -> [..., 12, L] in MyFq12.coeffs order."""
    c0s = [_fp_arr(a.s[i].c0) for i in range(6)]
    c1s = [_fp_arr(a.s[i].c1) for i in range(6)]
    return np.stack(c0s + c1s, axis=-2)


def _fq12_limbtree_arr(t) -> np.ndarray:
    """_fq12_to_limbs pytree (6 x (c0, c1) arrays [..., L]) -> [..., 12, L]."""
    c0s = [_np(t[i][0]) for i in range(6)]
    c1s = [_np(t[i][1]) for i in range(6)]
    return np.stack(c0s + c1s, axis=-2)


def _lines_arr(line3) -> np.ndarray:
    """3-tuple of Fp2 [..., ] -> [..., 3, 2, L]."""
    return np.stack([_fp2_arr(c) for c in line3], axis=-3)


def save_pairing_witness(path: str, p: G1, q: G2, out: Fq12,
                         trace: Dict) -> None:
    """Serialize a ``pairing_witness`` result (witness/trace.py) to npz.

    ``p``/``q`` must carry the same [*batch] shape used for the witness
    call; the trace's pairs axis K (=1 for single pairing) is preserved.
    """
    mt = trace["miller"]
    ft = trace["final_exp"]
    aff = mt["r_affine"]
    K = aff.x.c0.limbs.shape[1]

    # normalize p/q to carry the pairs axis ([K, *inner]) like the trace
    has_k = q.x.c0.limbs.ndim == aff.x.c0.limbs.ndim - 1
    px_a, py_a = _fp_arr(p.x), _fp_arr(p.y)
    qx_a, qy_a = _fp2_arr(q.x), _fp2_arr(q.y)
    if not has_k:
        px_a, py_a, qx_a, qy_a = px_a[None], py_a[None], qx_a[None], qy_a[None]

    def collapse(a: np.ndarray, lead: int, tail: int) -> np.ndarray:
        """Flatten the batch dims between ``lead`` leading and ``tail``
        trailing structural axes into one B axis."""
        shape = a.shape
        return a.reshape(shape[:lead] + (-1,) + shape[len(shape) - tail:])

    entries = {
        "p_x": collapse(px_a, 1, 1),
        "p_y": collapse(py_a, 1, 1),
        "q_x": collapse(qx_a, 1, 2),
        "q_y": collapse(qy_a, 1, 2),
        "r_affine_x": collapse(_fp2_arr(aff.x), 2, 2),
        "r_affine_y": collapse(_fp2_arr(aff.y), 2, 2),
        "tg_lines": collapse(_lines_arr(mt["tangent_lines"]), 2, 3),
        "ch_lines": collapse(_lines_arr(mt["chord_lines"]), 2, 3),
        "ep_lines": np.stack(
            [
                collapse(_lines_arr(mt["epilogue_lines"][0]), 1, 3),
                collapse(_lines_arr(mt["epilogue_lines"][1]), 1, 3),
            ]
        ),
        "q1_x": collapse(_fp2_arr(mt["q1"].x), 1, 2),
        "q1_y": collapse(_fp2_arr(mt["q1"].y), 1, 2),
        "nq2_x": collapse(_fp2_arr(mt["neg_q2"].x), 1, 2),
        "nq2_y": collapse(_fp2_arr(mt["neg_q2"].y), 1, 2),
        "f_steps": collapse(_fq12_limbtree_arr(mt["f_steps"]), 1, 2),
        "miller_out": collapse(_fq12_arr(trace["miller_out"]), 0, 2),
        "easy_out": collapse(_fq12_arr(ft["easy_part_out"]), 0, 2),
        "exp_bits": _np(ft["exp_inputs"][0].exp_bits).reshape(-1, 64)[0],
        "exp_rows": np.stack(
            [collapse(_fq12_limbtree_arr(r), 1, 2) for r in ft["exp_trace_rows"]]
        ),
        "exp_outs": np.stack(
            [collapse(_fq12_arr(x), 0, 2) for x in ft["exp_outputs"]]
        ),
        "final_out": collapse(_fq12_arr(out), 0, 2),
    }
    meta = {
        "version": FORMAT_VERSION,
        "nlimbs": F.NLIMBS,
        "radix_bits": F.RADIX_BITS,
        "p": str(P),
        "r_mont": str(F.R_MONT),
        "domain": "montgomery-redundant-2p",
        "k": K,
        "bn_x": str(BN_X),
        "naf": list(SIX_U_PLUS_2_NAF),
        "add_steps": list(ADD_STEPS),
        "n_steps": N_STEPS,
    }
    from . import aux as AUX

    entries.update(AUX.compute_aux_columns(meta, entries))
    np.savez_compressed(path, meta=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ), **entries)


def load_pairing_witness(path: str) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Load an npz witness; returns (meta dict, entry dict)."""
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    assert meta["version"] == FORMAT_VERSION, "unknown witness format version"
    data = {k: z[k] for k in z.files if k != "meta"}
    return meta, data
