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

from functools import lru_cache
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


def _comps_to_k(comps):
    """List of n limb arrays [..., L] (one flat lane space) ->
    ([n, L, R, 128], pad)."""
    flat = jnp.stack([c.reshape(-1, F.NLIMBS) for c in comps])  # [n, B, L]
    b = flat.shape[1]
    pad = (-b) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    n = flat.shape[1]
    return jnp.moveaxis(flat, -1, 1).reshape(len(comps), F.NLIMBS, n // 128, 128), pad


def _k_to_comps(arr, lead, batch, pad):
    """[*lead, n, L, R, 128] -> list of n limb arrays [*lead, *batch, L]."""
    nrows = arr.shape[-2]
    n_comp = arr.shape[len(lead)]
    flat = jnp.moveaxis(
        arr.reshape(lead + (n_comp, F.NLIMBS, nrows * 128)), -2, -1
    )  # [*lead, n, B_pad, L]
    if pad:
        flat = flat[..., : nrows * 128 - pad, :]
    full = flat.reshape(lead + (n_comp,) + batch + (F.NLIMBS,))
    return [full[(slice(None),) * len(lead) + (i,)] for i in range(n_comp)]


def _g2_to_traj_k(q: G2):
    """Affine Q batch -> trajectory-kernel input [4, L, R, 128] + pad."""
    return _comps_to_k(
        [
            F._cap_2p(q.x.c0).limbs,
            F._cap_2p(q.x.c1).limbs,
            F._cap_2p(q.y.c0).limbs,
            F._cap_2p(q.y.c1).limbs,
        ]
    )


def _trajectory_pallas(q: G2):
    """Phase B via the fq2_vm trajectory kernel; same output structure as
    :func:`_trajectory` (nested limb tuples, batch-last layout)."""
    from ..ops.curve_kernels import trajectory_pallas

    batch = q.batch_shape  # (K, *inner)
    q_arr, pad = _g2_to_traj_k(q)
    digits = np.asarray(STEP_DIGITS, np.int32)
    tops_k, dbls_k, end_k = trajectory_pallas(q_arr, digits)

    def back(arr, lead):
        c6 = _k_to_comps(arr, lead, batch, pad)
        return ((c6[0], c6[1]), (c6[2], c6[3]), (c6[4], c6[5]))

    tops = back(tops_k, (N_STEPS,))
    dbls = back(dbls_k, (N_STEPS,))
    end = back(end_k, ())
    return tops, dbls, end


# ---------------------------------------------------------------------------
# Fully kernel-resident Miller pipeline (Pallas backend)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _affine_export_program(bx: int, by: int):
    """VM program: (X, Y, zinv) -> (X*zinv^2, Y*zinv^3) per stack state.

    Used by the witness path to materialize the affine trajectory
    (serialize.py r_affine stack) from the streams the resident pipeline
    already carries; the production path folds the affine conversion into
    the lines kernel and never materializes it."""
    from ..ops.fq2_vm import Fq2Assembler

    a = Fq2Assembler(7)
    a.set_bound(0, bx)  # X
    a.set_bound(1, by)  # Y
    a.set_bound(2, 2 * F.P)  # zinv (running_inverse output envelope)
    a.sq(3, 2)  # zi^2
    a.mul(4, 3, 2)  # zi^3
    a.mul(5, 0, 3)  # affine x
    a.mul(6, 1, 4)  # affine y
    return a.table(), (5, 6), 7


def _miller_pallas_resident(qs: G2, ps: G1, K: int, inner, keep_k: bool,
                            collect: bool = False):
    """Phases B→N→C→D + epilogue with every stage in kernel layout.

    Dataflow (all [.., L, R, 128] int32; no batch-last round-trips):
      trajectory kernel → z-stack concat → prefix/inverse kernels →
      lines kernel (affine fold-in) → fused f kernel → epilogue sparse
      muls. Only the single end/st91 states and the Fq2 total-inverse
      make (tiny) XLA excursions. Returns Fq12, or (f_arr, inner, pad)
      when ``keep_k``; with ``collect`` returns (result, trace) where the
      trace carries the full witness payload (per-step f, affine
      trajectory, line coefficients — miller_loop_target.rs:132-311) on
      the same kernel-resident schedule as production.
    """
    from ..ops.curve_kernels import trajectory_bounds, trajectory_pallas
    from ..ops.fq12_kernels import from_kernel_layout
    from ..ops.fq2_vm import fp2s_to_vm, vm_to_fp2s
    from ..ops.fused_kernels import miller_f_pallas
    from ..ops.line_kernels import lines_pallas
    from ..ops.norm_kernels import prefix_products_pallas, running_inverse_pallas

    digits = np.asarray(STEP_DIGITS, np.int32)
    kbatch = (K,) + inner

    # Phase B: trajectory (kernel layout, lanes = K*inner). Outputs are
    # redundant representatives with bounds above 2p (the per-step caps
    # were ~22% of the kernel); all consumers take the static bounds.
    q_arr, pad = _g2_to_traj_k(qs)
    tops_k, dbls_k, end_k = trajectory_pallas(q_arr, digits)
    nrows_kb = tops_k.shape[3]
    tb = trajectory_bounds()
    (bx, by, bz) = tb["top"]
    (bxd, byd, bzd) = tb["dbl"]

    # Epilogue points (miller_loop_native.rs:183-188) — single states, XLA.
    q1 = twisted_frobenius(qs)
    nq2 = neg_twisted_frobenius(q1)
    e6 = _k_to_comps(end_k, (), kbatch, pad)
    end = G2Jac(
        Fp2(F.Fp(e6[0], bx, F.SETTLED), F.Fp(e6[1], bx, F.SETTLED)),
        Fp2(F.Fp(e6[2], by, F.SETTLED), F.Fp(e6[3], by, F.SETTLED)),
        Fp2(F.Fp(e6[4], bz, F.SETTLED), F.Fp(e6[5], bz, F.SETTLED)),
    )
    st91 = _jac_cap(jac_mixed_add(end, q1))
    st91_k, _ = _comps_to_k(
        [
            st91.X.c0.limbs, st91.X.c1.limbs,
            st91.Y.c0.limbs, st91.Y.c1.limbs,
            st91.Z.c0.limbs, st91.Z.c1.limbs,
        ]
    )

    # Phase N: z-stack [130, 2, L, R, 128] → prefix/total → zinv.
    z_stack = jnp.concatenate(
        [
            tops_k[:, 4:6],
            dbls_k[:, 4:6],
            end_k[None, 4:6],
            st91_k.reshape(3, 2, F.NLIMBS, nrows_kb, 128)[None, 2],
        ],
        axis=0,
    )
    z_bound = max(bz, bzd, 2 * F.P)
    prefix, total = prefix_products_pallas(z_stack, z_bound=z_bound)
    (total_fp2,) = vm_to_fp2s(total[None], (nrows_kb * 128,), 0)
    tinv = F2.cap(F2.inv(total_fp2))
    tinv_arr, _, _ = fp2s_to_vm([tinv])
    zinv = running_inverse_pallas(z_stack, prefix, tinv_arr[0],
                                  z_bound=z_bound)

    # Phase C: lines kernel (affine conversion folded in).
    px = F._cap_2p(ps.x)
    py = F._cap_2p(ps.y)
    pq_arr, _ = _comps_to_k(
        [
            px.limbs, py.limbs,
            F._cap_2p(qs.x.c0).limbs, F._cap_2p(qs.x.c1).limbs,
            F._cap_2p(qs.y.c0).limbs, F._cap_2p(qs.y.c1).limbs,
        ]
    )
    tg_s, ch_s, line_bound = lines_pallas(
        tops_k, dbls_k, zinv, pq_arr, digits,
        state_bounds=((bx, by), (bxd, byd)),
    )

    # Separate the pairs axis from lanes into per-pair component groups.
    r_in = nrows_kb // K

    def split_k(x):
        if K == 1:
            return x
        return jnp.moveaxis(
            x.reshape(N_STEPS, 6, F.NLIMBS, K, r_in, 128), 3, 1
        ).reshape(N_STEPS, K * 6, F.NLIMBS, r_in, 128)

    # Epilogue lines from the end/st91 affine states (XLA, 2 states),
    # fused into the f kernel as two trailing chord-only steps.
    zs = vm_to_fp2s(zinv[2 * N_STEPS : 2 * N_STEPS + 2], kbatch, pad)

    def to_aff(jac: G2Jac, zi: Fp2) -> G2:
        zi2 = F2.square(zi)
        zi3 = F2.mul(zi2, zi)
        return G2(F2.mul(jac.X, zi2), F2.mul(jac.Y, zi3))

    aff_end = to_aff(end, zs[0])
    aff_st91 = to_aff(st91, zs[1])
    e1 = lines.line_unequal(aff_end.x, aff_end.y, q1.x, q1.y, px, py)
    e2 = lines.line_unequal(aff_st91.x, aff_st91.y, nq2.x, nq2.y, px, py)

    flags_np = np.asarray([1 if d != 0 else 0 for d in STEP_DIGITS], np.int32)
    f_arr, fs_arr = _fused_miller_with_epilogue(
        split_k(tg_s), split_k(ch_s), e1, e2, flags_np, K, nrows_kb,
        line_bound=line_bound, collect=collect,
    )

    nrows_in = f_arr.shape[2]
    inner_pad = nrows_in * 128 - int(np.prod(inner, dtype=np.int64))
    result = (
        (f_arr, inner, inner_pad)
        if keep_k
        else from_kernel_layout(f_arr, inner, inner_pad)
    )
    if not collect:
        return result

    # ---- witness trace assembly (kernel-resident producers) ----
    from ..ops.fq2_vm import vm_apply_stacked

    # Affine trajectory stack [130, K, *inner] in serialize.py order
    # (tops 0..63, post-doubles 64..127, end 128, st91 129).
    n_states = 2 * N_STEPS + 2
    xy_stack = jnp.concatenate(
        [
            tops_k[:, 0:4],
            dbls_k[:, 0:4],
            end_k[None, 0:4],
            st91_k[None, 0:4],
        ],
        axis=0,
    )  # [130, 4, L, R, 128]
    prog, outs, nreg = _affine_export_program(
        max(bx, bxd, 2 * F.P), max(by, byd, 2 * F.P)
    )
    vm_in = jnp.concatenate(
        [
            xy_stack.reshape(n_states, 2, 2, F.NLIMBS, nrows_kb, 128),
            zinv[:, None],
        ],
        axis=1,
    )  # [130, 3(regs X, Y, zi), 2, L, R, 128]
    aff_arr = vm_apply_stacked(prog, vm_in, outs, nreg)
    aff_c = _k_to_comps(
        aff_arr.reshape(n_states, 4, F.NLIMBS, nrows_kb, 128),
        (n_states,), kbatch, pad,
    )
    mk2 = lambda c0, c1: Fp2(
        F.Fp(c0, 2 * F.P, F.SETTLED), F.Fp(c1, 2 * F.P, F.SETTLED)
    )
    aff = G2(mk2(aff_c[0], aff_c[1]), mk2(aff_c[2], aff_c[3]))

    # Line streams -> Fp2 stacks (tg: all 64 steps; ch: the 25 add steps)
    def lines_to_fp2(arr):
        c6 = _k_to_comps(arr, (arr.shape[0],), kbatch, pad)
        return tuple(
            Fp2(
                F.Fp(c6[2 * j], line_bound, F.SETTLED),
                F.Fp(c6[2 * j + 1], line_bound, F.SETTLED),
            )
            for j in range(3)
        )

    tg_trace = lines_to_fp2(tg_s)
    ch_trace = lines_to_fp2(ch_s[jnp.asarray(np.asarray(ADD_STEPS, np.int32))])

    c12 = _k_to_comps(fs_arr[:N_STEPS], (N_STEPS,), inner, inner_pad)
    f_steps = tuple((c12[2 * i], c12[2 * i + 1]) for i in range(6))

    trace = {
        "f_steps": f_steps,
        "r_affine": aff,
        "tangent_lines": tg_trace,
        "chord_lines": ch_trace,
        "epilogue_lines": (e1, e2),
        "q1": q1,
        "neg_q2": nq2,
    }
    return result, trace


# ---------------------------------------------------------------------------
# Core Miller loop (pairs axis K leading)
# ---------------------------------------------------------------------------


def _miller_core(qs: G2, ps: G1, collect_trace: bool = False,
                 keep_k: bool = False):
    """Multi-Miller product over a leading pairs axis K.

    qs, ps have batch shape [K, ...]; returns the Fq12 Miller value of the
    product of all K pairings with shared squarings. With
    ``collect_trace=True`` also returns the witness trace (per-step f,
    affine trajectory, line coefficients) — the batched analogue of the
    reference's circuit-side value flow (miller_loop_target.rs:132-311).

    With ``keep_k=True`` (Pallas backend only) the result stays in the
    kernel layout: returns ``(f_arr, inner, pad)`` so the caller can chain
    final_exp_k without layout round-trips.
    """
    kshape = qs.batch_shape
    assert len(kshape) >= 1
    K = kshape[0]
    inner = kshape[1:]

    from ..ops import dispatch

    # Production path: every phase kernel-resident; the fused f-kernel
    # streams per-pair line blocks so any K works with constant VMEM.
    # K > 1 needs the per-pair lane split to be pad-free.
    lanes = K * int(np.prod(inner, dtype=np.int64))
    # K > 1 resident runs split the padded lane space per pair, so each
    # pair's share must itself tile to whole (8, 128) f-kernel blocks.
    resident_ok = K == 1 or (lanes % 1024 == 0 and lanes // K % 1024 == 0)
    if dispatch.use_pallas() and resident_ok:
        return _miller_pallas_resident(qs, ps, K, inner, keep_k,
                                       collect=collect_trace)

    # Phase B: trajectories for all pairs at once ([K, ...] batch) —
    # fused VM kernel on TPU, lax.scan elsewhere. The pallas trajectory
    # emits redundant representatives (bounds above 2p — the per-step
    # caps were ~22% of the kernel); declare its static bounds so the
    # XLA layer's bound discipline inserts any needed weak reductions.
    if dispatch.use_pallas():
        from ..ops.curve_kernels import trajectory_bounds

        tops, dbls, end_l = _trajectory_pallas(qs)
        tb = trajectory_bounds()
    else:
        tops, dbls, end_l = _trajectory(qs)
        tb = {"top": (2 * F.P,) * 3, "dbl": (2 * F.P,) * 3}

    # Epilogue points (miller_loop_native.rs:183-188).
    q1 = twisted_frobenius(qs)
    nq2 = neg_twisted_frobenius(q1)
    end = G2Jac(
        *(
            Fp2(
                F.Fp(end_l[i][0], tb["top"][i], F.SETTLED),
                F.Fp(end_l[i][1], tb["top"][i], F.SETTLED),
            )
            for i in range(3)
        )
    )
    st91 = _jac_cap(jac_mixed_add(end, q1))

    # Phase N: one bulk normalization of [64 tops + 64 dbls + end + st91].
    def cat(field_idx, comp):
        parts = [tops[field_idx][comp], dbls[field_idx][comp]]
        parts.append(end_l[field_idx][comp][None])
        st = _jac_to_limbs(st91)
        parts.append(st[field_idx][comp][None])
        return jnp.concatenate(parts, axis=0)  # [130, K, ..., L]

    def cat_bound(i):
        return max(tb["top"][i], tb["dbl"][i], 2 * F.P)

    stack = G2Jac(
        *(
            Fp2(
                F.Fp(cat(i, 0), cat_bound(i), F.SETTLED),
                F.Fp(cat(i, 1), cat_bound(i), F.SETTLED),
            )
            for i in range(3)
        )
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
    flags_np = np.asarray([1 if d != 0 else 0 for d in STEP_DIGITS], np.int32)
    # Fused-kernel path for batches the resident pipeline declined (ragged
    # multi-pair lane splits) and for witness tracing (collect streams the
    # per-step accumulator out of the same production kernel).
    if dispatch.use_pallas():
        from ..ops.fq12_kernels import from_kernel_layout
        from ..ops.fused_kernels import miller_f_pallas

        arr, pad = _lines_to_kernel_layout(list(tg), K)
        ch_arr, _ = _lines_to_kernel_layout(list(ch_full), K)

        if collect_trace:
            f_arr, fs_arr = miller_f_pallas(arr, ch_arr, flags_np, K,
                                            collect=True)
            c12 = _k_to_comps(fs_arr, (N_STEPS,), inner, pad)
            f_steps = tuple((c12[2 * i], c12[2 * i + 1]) for i in range(6))
            f = from_kernel_layout(f_arr, inner, pad)
        else:
            # Epilogue multiplies fused into the f kernel
            # (miller_loop_native.rs:274-280).
            nrows = arr.shape[3] * K
            f_arr, _ = _fused_miller_with_epilogue(
                arr, ch_arr, e1, e2, flags_np, K, nrows
            )
            if keep_k:
                return f_arr, inner, pad
            return from_kernel_layout(f_arr, inner, pad)
    else:
        assert not keep_k, "keep_k requires the Pallas phase-D path"
        f, f_steps = _phase_d_scan(tg, ch_full, flags_np, K, inner,
                                   collect_trace)

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


def _ep_lines_to_stream(line3, K, nrows):
    """3 x Fp2 [K, *inner] (one epilogue line per pair) -> one fused-kernel
    chord-step block [K*6, NLIMBS, nrows//K, 128] (pair-major rows,
    zero-padded lanes)."""
    comps = []
    for fp2 in line3:
        comps.append(F._cap_2p(fp2.c0).limbs)
        comps.append(F._cap_2p(fp2.c1).limbs)
    x = jnp.stack(comps, axis=1)  # [K, 6, *inner, L]
    flat = x.reshape(K, 6, -1, F.NLIMBS)
    r_in = nrows // K
    need = r_in * 128
    b = flat.shape[2]
    assert b <= need
    if b < need:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, need - b), (0, 0)))
    return jnp.moveaxis(flat, -1, 2).reshape(K * 6, F.NLIMBS, r_in, 128)


def _fused_miller_with_epilogue(tg_arr, ch_arr, e1, e2, flags_np, K, nrows,
                                line_bound: int = 0, collect: bool = False):
    """Run the f-accumulation with the two Frobenius-line multiplies
    (miller_loop_native.rs:274-280) fused as trailing chord-only steps —
    no per-pair host-side kernel launches (the multiply order across
    pairs differs from the reference's per-pair order, which is
    value-identical: Fq12 multiplication is commutative).

    Returns (f_arr, fs_arr): ``fs_arr`` is the per-step accumulator
    stream (witness f_steps; rows [:64] are the Miller steps) when
    ``collect``, else None."""
    from ..ops.fused_kernels import miller_f_pallas

    ep = jnp.stack(
        [_ep_lines_to_stream(list(e), K, nrows) for e in (e1, e2)]
    )  # [2, K*6, L, r_in, 128]
    flags_full = np.concatenate([flags_np, np.asarray([2, 2], np.int32)])
    out = miller_f_pallas(tg_arr, ch_arr, flags_full, K, ep_arr=ep,
                          line_bound=line_bound, collect=collect)
    return out if collect else (out, None)


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


def miller_loop_k(q: G2, p: G1):
    """Kernel-layout Miller loop (Pallas backend): returns
    ``(f_arr, batch_shape, pad)`` for chaining with final_exp_k."""
    return _miller_core(_add_pairs_axis(q), _add_pairs_axis(p), keep_k=True)


def multi_miller_loop_k(qs: G2, ps: G1):
    """Kernel-layout multi-Miller product (Pallas backend): returns
    ``(f_arr, batch_shape, pad)`` for chaining with final_exp_k."""
    return _miller_core(qs, ps, keep_k=True)


def multi_miller_loop(qs: G2, ps: G1) -> Fq12:
    """multi_miller_loop_native (miller_loop_native.rs:324-326): product of
    K pairings with shared squarings; leading axis of qs/ps is K.

    The fused kernel streams per-pair line blocks over a (batch, step,
    pair) grid, so ANY K shares the 63 squarings (the reference's
    defining amortization, miller_loop_native.rs:239) with constant
    VMEM."""
    return _miller_core(qs, ps)
