"""Batched optimal-ate Miller loop, TPU-first.

Algorithm parity: miller_loop_BN_native / multi_miller_loop_BN_native
(/root/reference/src/miller_loop_native.rs:112-282). Outputs are bit-exact
(canonical limbs) with the reference because every affine point and line
value along the trajectory is the same field element; only the *schedule*
is reorganized for TPU:

  Phase B — point trajectory as a lax.scan in Jacobian coordinates
            (no inversions; 64 doublings + digit-masked mixed additions);
  Phase N — ONE bulk batch_to_affine over the 130-state trajectory stack
            (single Fermat inversion per lane via Montgomery's trick),
            replacing the reference's ~90 sequential affine inversions;
  Phase C — all 64 tangent + 25 chord + 2 Frobenius-chord lines evaluated
            in one batched shot over the stacked affine states;
  Phase D — f-accumulation as a lax.scan: f <- f^2 * tangent_t, then a
            digit-masked sparse chord multiply (values match the
            reference's interleaved order exactly; Fq12 muls commute).

The shared-squaring structure of multi_miller_loop (one f^2 per iteration
for k pairs, miller_loop_native.rs:239) is preserved: the scan body squares
once and multiplies k tangent/chord lines.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bn254 import SIX_U_PLUS_2_NAF
from ..fields import fp as F
from ..fields import fp2 as F2
from ..fields import fp12 as F12
from ..fields.fp2 import Fp2
from ..fields.fp12 import Fq12
from ..curves.g1 import G1
from ..curves.g2 import (
    G2,
    G2Jac,
    batch_to_affine,
    g2_neg,
    g2_select,
    jac_double,
    jac_from_affine,
    jac_mixed_add,
    jac_select,
    neg_twisted_frobenius,
    twisted_frobenius,
)
from . import lines

# ---------------------------------------------------------------------------
# Static schedule
# ---------------------------------------------------------------------------

assert SIX_U_PLUS_2_NAF[64] == 1, "top NAF digit must be 1"
#: digit for Miller step t (t = 0..63 corresponds to NAF index i = 63-t).
STEP_DIGITS: Tuple[int, ...] = tuple(SIX_U_PLUS_2_NAF[63 - t] for t in range(64))
#: steps with a chord (addition) part.
ADD_STEPS: Tuple[int, ...] = tuple(t for t, d in enumerate(STEP_DIGITS) if d != 0)
N_STEPS = 64
N_ADDS = len(ADD_STEPS)  # 25 in-loop additions


# ---------------------------------------------------------------------------
# Raw-limb helpers (fixed (2p, settled) envelope for scan carries)
# ---------------------------------------------------------------------------


def _jac_to_limbs(p: G2Jac):
    return (F2.to_limbs(p.X), F2.to_limbs(p.Y), F2.to_limbs(p.Z))


def _jac_from_limbs(t) -> G2Jac:
    return G2Jac(F2.from_limbs(t[0]), F2.from_limbs(t[1]), F2.from_limbs(t[2]))


def _jac_cap(p: G2Jac) -> G2Jac:
    return G2Jac(F2.cap(p.X), F2.cap(p.Y), F2.cap(p.Z))


def _fq12_to_limbs(a: Fq12):
    return tuple(F2.to_limbs(s) for s in a.s)


def _fq12_from_limbs(t) -> Fq12:
    return Fq12(tuple(F2.from_limbs(x) for x in t))


def fq12_cap(a: Fq12) -> Fq12:
    return Fq12(tuple(F2.cap(s) for s in a.s))


def _stack_fp2(items) -> Fp2:
    """[Fp2 (batch...)] -> Fp2 with new leading axis."""
    c0 = jnp.stack([F._cap_2p(x.c0).limbs for x in items])
    c1 = jnp.stack([F._cap_2p(x.c1).limbs for x in items])
    from ..utils.bn254 import P as _P

    return Fp2(F.Fp(c0, 2 * _P, F.SETTLED), F.Fp(c1, 2 * _P, F.SETTLED))


# ---------------------------------------------------------------------------
# Phase B: trajectory scan
# ---------------------------------------------------------------------------


def _trajectory(q: G2):
    """Scan the 64 Miller steps; returns (top_states, postdouble_states,
    end_state) as limb pytrees stacked along axis 0 (for top/postdouble)."""
    nq = g2_neg(q)
    digits = jnp.asarray(np.asarray(STEP_DIGITS, dtype=np.int32))

    q_l = (F2.to_limbs(F2.cap(q.x)), F2.to_limbs(F2.cap(q.y)))
    nq_l = (F2.to_limbs(F2.cap(nq.x)), F2.to_limbs(F2.cap(nq.y)))

    def body(carry, digit):
        cur = _jac_from_limbs(carry)
        top = carry
        dbl = _jac_cap(jac_double(cur))
        partner_x = F2.select(
            jnp.broadcast_to(digit > 0, q.batch_shape),
            F2.from_limbs(q_l[0]),
            F2.from_limbs(nq_l[0]),
        )
        partner_y = F2.select(
            jnp.broadcast_to(digit > 0, q.batch_shape),
            F2.from_limbs(q_l[1]),
            F2.from_limbs(nq_l[1]),
        )
        added = _jac_cap(jac_mixed_add(dbl, G2(partner_x, partner_y)))
        nxt = jac_select(
            jnp.broadcast_to(digit != 0, q.batch_shape), added, dbl
        )
        nxt = G2Jac(
            Fp2(F.Fp(nxt.X.c0.limbs, 2 * F.P, F.SETTLED), F.Fp(nxt.X.c1.limbs, 2 * F.P, F.SETTLED)),
            Fp2(F.Fp(nxt.Y.c0.limbs, 2 * F.P, F.SETTLED), F.Fp(nxt.Y.c1.limbs, 2 * F.P, F.SETTLED)),
            Fp2(F.Fp(nxt.Z.c0.limbs, 2 * F.P, F.SETTLED), F.Fp(nxt.Z.c1.limbs, 2 * F.P, F.SETTLED)),
        )
        return _jac_to_limbs(nxt), (top, _jac_to_limbs(dbl))

    init = _jac_to_limbs(_jac_cap(jac_from_affine(q)))
    end, (tops, dbls) = jax.lax.scan(body, init, digits)
    return tops, dbls, end


def _trajectory_pallas(q: G2):
    """Phase B via the fq2_vm trajectory kernel; same output structure as
    :func:`_trajectory` (nested limb tuples, batch-last layout)."""
    from ..ops.curve_kernels import trajectory_pallas

    batch = q.batch_shape  # (K, *inner)
    comps = [
        F._cap_2p(q.x.c0).limbs,
        F._cap_2p(q.x.c1).limbs,
        F._cap_2p(q.y.c0).limbs,
        F._cap_2p(q.y.c1).limbs,
    ]
    flat = jnp.stack([c.reshape(-1, F.NLIMBS) for c in comps])  # [4, B, L]
    b = flat.shape[1]
    pad = (-b) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    n = flat.shape[1]
    q_arr = jnp.moveaxis(flat, -1, 1).reshape(4, F.NLIMBS, n // 128, 128)

    digits = np.asarray(STEP_DIGITS, np.int32)
    tops_k, dbls_k, end_k = trajectory_pallas(q_arr, digits)

    def back(arr, lead):  # [*lead, 6, L, R, 128] -> nested limb tuples
        nrows = arr.shape[-2]
        flat = jnp.moveaxis(
            arr.reshape(lead + (6, F.NLIMBS, nrows * 128)), -2, -1
        )  # [*lead, 6, B_pad, L]
        if pad:
            flat = flat[..., : n - pad, :]
        full = flat.reshape(lead + (6,) + batch + (F.NLIMBS,))
        comps6 = [full[(slice(None),) * len(lead) + (i,)] for i in range(6)]
        return (
            (comps6[0], comps6[1]),
            (comps6[2], comps6[3]),
            (comps6[4], comps6[5]),
        )

    tops = back(tops_k, (N_STEPS,))
    dbls = back(dbls_k, (N_STEPS,))
    end = back(end_k, ())
    return tops, dbls, end


# ---------------------------------------------------------------------------
# Core Miller loop (pairs axis K leading)
# ---------------------------------------------------------------------------


def _miller_core(qs: G2, ps: G1, collect_trace: bool = False):
    """Multi-Miller product over a leading pairs axis K.

    qs, ps have batch shape [K, ...]; returns the Fq12 Miller value of the
    product of all K pairings with shared squarings. With
    ``collect_trace=True`` also returns the witness trace (per-step f,
    affine trajectory, line coefficients) — the batched analogue of the
    reference's circuit-side value flow (miller_loop_target.rs:132-311).
    """
    kshape = qs.batch_shape
    assert len(kshape) >= 1
    K = kshape[0]
    inner = kshape[1:]

    # Phase B: trajectories for all pairs at once ([K, ...] batch) —
    # fused VM kernel on TPU, lax.scan elsewhere.
    from ..ops import dispatch

    if dispatch.use_pallas():
        tops, dbls, end_l = _trajectory_pallas(qs)
    else:
        tops, dbls, end_l = _trajectory(qs)

    # Epilogue points (miller_loop_native.rs:183-188).
    q1 = twisted_frobenius(qs)
    nq2 = neg_twisted_frobenius(q1)
    end = _jac_from_limbs(end_l)
    st91 = _jac_cap(jac_mixed_add(end, q1))

    # Phase N: one bulk normalization of [64 tops + 64 dbls + end + st91].
    def cat(field_idx, comp):
        parts = [tops[field_idx][comp], dbls[field_idx][comp]]
        parts.append(end_l[field_idx][comp][None])
        st = _jac_to_limbs(st91)
        parts.append(st[field_idx][comp][None])
        return jnp.concatenate(parts, axis=0)  # [130, K, ..., L]

    stack = G2Jac(
        Fp2(F.Fp(cat(0, 0), 2 * F.P, F.SETTLED), F.Fp(cat(0, 1), 2 * F.P, F.SETTLED)),
        Fp2(F.Fp(cat(1, 0), 2 * F.P, F.SETTLED), F.Fp(cat(1, 1), 2 * F.P, F.SETTLED)),
        Fp2(F.Fp(cat(2, 0), 2 * F.P, F.SETTLED), F.Fp(cat(2, 1), 2 * F.P, F.SETTLED)),
    )
    aff = batch_to_affine(stack)  # G2 with batch [130, K, ...]

    ax, ay = aff.x, aff.y

    def slice_fp2(v: Fp2, sl) -> Fp2:
        return Fp2(
            F.Fp(v.c0.limbs[sl], v.c0.bound, v.c0.limb_bound),
            F.Fp(v.c1.limbs[sl], v.c1.bound, v.c1.limb_bound),
        )

    # Phase C: lines.
    px_b = F._cap_2p(ps.x)  # [K, ...]
    py_b = F._cap_2p(ps.y)
    tg = lines.line_equal(
        slice_fp2(ax, slice(0, 64)), slice_fp2(ay, slice(0, 64)), px_b, py_b
    )  # 3 x Fp2 [64, K, ...]

    # chords at digit steps: R = postdouble, partner = Q or -Q (static sign)
    add_idx = np.asarray([64 + t for t in ADD_STEPS], dtype=np.int32)
    ch_r_x = slice_fp2(ax, jnp.asarray(add_idx))
    ch_r_y = slice_fp2(ay, jnp.asarray(add_idx))
    nqs = g2_neg(qs)
    partner = [
        (qs if STEP_DIGITS[t] == 1 else nqs) for t in ADD_STEPS
    ]
    pa_x = _stack_fp2([p.x for p in partner])  # [25, K, ...]
    pa_y = _stack_fp2([p.y for p in partner])
    ch = lines.line_unequal(ch_r_x, ch_r_y, pa_x, pa_y, px_b, py_b)

    # epilogue chords: (end, Q1) and (st91, -Q2)
    e1 = lines.line_unequal(
        slice_fp2(ax, 128), slice_fp2(ay, 128), q1.x, q1.y, px_b, py_b
    )
    e2 = lines.line_unequal(
        slice_fp2(ax, 129), slice_fp2(ay, 129), nq2.x, nq2.y, px_b, py_b
    )

    # Scatter chord lines into a [64, K, ...] stack (zeros elsewhere).
    def scatter(chv: Fp2) -> Fp2:
        z0 = jnp.zeros((N_STEPS,) + chv.c0.limbs.shape[1:], jnp.int32)
        z1 = jnp.zeros_like(z0)
        c0 = z0.at[jnp.asarray(np.asarray(ADD_STEPS, np.int32))].set(chv.c0.limbs)
        c1 = z1.at[jnp.asarray(np.asarray(ADD_STEPS, np.int32))].set(chv.c1.limbs)
        return Fp2(F.Fp(c0, 2 * F.P, F.SETTLED), F.Fp(c1, 2 * F.P, F.SETTLED))

    ch_full = tuple(scatter(c) for c in ch)

    # Phase D: f-accumulation — fused Pallas kernel on TPU, lax.scan
    # fallback elsewhere / when tracing witnesses.
    from ..ops import dispatch

    flags_np = np.asarray([1 if d != 0 else 0 for d in STEP_DIGITS], np.int32)
    # The fused kernel streams n_pairs*6 line components per step; K <= 2
    # fits VMEM comfortably — larger products fall back to the scan.
    if dispatch.use_pallas() and not collect_trace and K <= 2:
        f = _phase_d_pallas(tg, ch_full, flags_np, K, inner)
        f_steps = None
    else:
        f, f_steps = _phase_d_scan(tg, ch_full, flags_np, K, inner, collect_trace)

    # Epilogue multiplies, per pair in order (miller_loop_native.rs:274-280).
    for k in range(K):

        def pick(v: Fp2, kk=0):
            return F2.from_limbs((v.c0.limbs[kk], v.c1.limbs[kk]))

        f = F12.fq12_mul_sparse(
            f, {2: pick(e1[0], k), 3: pick(e1[1], k), 5: pick(e1[2], k)}
        )
        f = F12.fq12_mul_sparse(
            f, {2: pick(e2[0], k), 3: pick(e2[1], k), 5: pick(e2[2], k)}
        )
    f = fq12_cap(f)
    if not collect_trace:
        return f
    trace = {
        "f_steps": f_steps,  # per-iteration f limb pytree, leading axis 64
        "r_affine": aff,  # G2 stack [130, K, ...]: 64 tops, 64 dbls, end, +Q1
        "tangent_lines": tg,  # 3 x Fp2 [64, K, ...]
        "chord_lines": ch,  # 3 x Fp2 [N_ADDS, K, ...]
        "epilogue_lines": (e1, e2),  # 3 x Fp2 [K, ...] each
        "q1": q1,
        "neg_q2": nq2,
    }
    return f, trace


def _phase_d_scan(tg, ch_full, flags_np, K, inner, collect_trace):
    flags = jnp.asarray(flags_np)

    def fbody(f_l, xs):
        tg0, tg3, tg4, c2, c3, c5, flag = xs
        f = _fq12_from_limbs(f_l)
        f = F12.fq12_sq(f)
        for k in range(K):

            def pick(v):
                return F2.from_limbs((v[0][k], v[1][k]))

            f = F12.fq12_mul_sparse(
                f, {0: pick(tg0), 3: pick(tg3), 4: pick(tg4)}
            )
        fc = f
        for k in range(K):

            def pick(v):
                return F2.from_limbs((v[0][k], v[1][k]))

            fc = F12.fq12_mul_sparse(
                fc, {2: pick(c2), 3: pick(c3), 5: pick(c5)}
            )
        f = F12.fq12_select(jnp.broadcast_to(flag != 0, inner), fc, f)
        out_l = _fq12_to_limbs(fq12_cap(f))
        return out_l, (out_l if collect_trace else None)

    one = fq12_cap(F12.fq12_one(inner))
    xs = (
        F2.to_limbs(tg[0]),
        F2.to_limbs(tg[1]),
        F2.to_limbs(tg[2]),
        F2.to_limbs(ch_full[0]),
        F2.to_limbs(ch_full[1]),
        F2.to_limbs(ch_full[2]),
        flags,
    )
    f_l, f_steps = jax.lax.scan(fbody, _fq12_to_limbs(one), xs)
    return _fq12_from_limbs(f_l), f_steps


def _phase_d_pallas(tg, ch_full, flags_np, K, inner):
    """Fused Miller f-accumulation via the Pallas kernel."""
    from ..ops.fq12_kernels import from_kernel_layout
    from ..ops.fused_kernels import miller_f_pallas

    arr, pad = _lines_to_kernel_layout(list(tg), K)
    ch_arr, _ = _lines_to_kernel_layout(list(ch_full), K)
    out = miller_f_pallas(arr, ch_arr, flags_np, K)
    return from_kernel_layout(out, inner, pad)


def _lines_to_kernel_layout(line3, K):
    """3 x Fp2 [steps, K, *inner] -> [steps, K*6, NLIMBS, R, 128] + pad."""
    arrs = []
    for fp2 in line3:
        arrs.append(F._cap_2p(fp2.c0).limbs)
        arrs.append(F._cap_2p(fp2.c1).limbs)
    # element shape [S, K, *inner, L]; want [S, K, 6, *inner, L]
    x = jnp.stack(arrs, axis=2)
    s = x.shape[0]
    L = x.shape[-1]
    flat = x.reshape(s, K * 6, -1, L)
    b = flat.shape[2]
    pad = (-b) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n = flat.shape[2]
    out = jnp.moveaxis(flat, -1, 2).reshape(s, K * 6, L, n // 128, 128)
    return out, pad


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _add_pairs_axis(x):
    return jax.tree.map(lambda a: a[None], x)


def miller_loop(q: G2, p: G1) -> Fq12:
    """miller_loop_native (miller_loop_native.rs:320-322), batched."""
    return _miller_core(_add_pairs_axis(q), _add_pairs_axis(p))


def multi_miller_loop(qs: G2, ps: G1) -> Fq12:
    """multi_miller_loop_native (miller_loop_native.rs:324-326): product of
    K pairings with shared squarings; leading axis of qs/ps is K.

    On the pallas backend, K > 2 products are split into K<=2 groups whose
    partial accumulators multiply together — value-identical because line
    factors commute into f multiplicatively (SURVEY.md §3.4)."""
    from ..ops import dispatch

    K = qs.batch_shape[0]
    if dispatch.use_pallas() and K > 2:
        f = None
        for start in range(0, K, 2):
            sl = slice(start, min(start + 2, K))
            part = _miller_core(
                jax.tree.map(lambda a: a[sl], qs),
                jax.tree.map(lambda a: a[sl], ps),
            )
            f = part if f is None else fq12_cap(dispatch.fq12_mul(f, part))
        return f
    return _miller_core(qs, ps)
