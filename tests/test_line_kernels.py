"""Lines kernel (Phase C) vs the oracle, interpret mode on CPU.

Uses a short synthetic schedule (4 steps) with random Jacobian states
constructed directly from affine points and known z (full-length streams
are validated on hardware by tpu_validate.py). Covers digit +1 / -1 / 0
partner selection and the folded affine conversion.
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_slow = pytest.mark.skipif(
    "PAIRING_SLOW_TESTS" not in os.environ,
    reason="VM program re-traces per interpret grid step; slow on CPU "
    "(set PAIRING_SLOW_TESTS=1); hardware path covered by tpu_validate.py",
)

from pairing_tpu.fields import fp as F
from pairing_tpu.fields import fp2 as F2
from pairing_tpu.oracle import native as o
from pairing_tpu.utils.bn254 import P

RNG = random.Random(777)
B = 3  # lanes
STEPS = 4
DIGITS = np.asarray([1, -1, 0, 1], np.int32)


def fq2_rand():
    return (RNG.randrange(P), RNG.randrange(P))


@_slow
def test_lines_kernel_vs_oracle():
    from pairing_tpu.ops.line_kernels import lines_pallas
    from pairing_tpu.pairing.miller_loop import _comps_to_k, _k_to_comps

    # Synthetic per-step states: affine (x, y) plus a z scale per state.
    tops, dbls = [], []  # [(x, y, z)] per step, each a lane-list
    for _ in range(STEPS):
        tops.append([(fq2_rand(), fq2_rand(), fq2_rand()) for _ in range(B)])
        dbls.append([(fq2_rand(), fq2_rand(), fq2_rand()) for _ in range(B)])
    pxs = [RNG.randrange(P) for _ in range(B)]
    pys = [RNG.randrange(P) for _ in range(B)]
    qxs = [fq2_rand() for _ in range(B)]
    qys = [fq2_rand() for _ in range(B)]

    def jac(states):
        """affine+z -> (X, Y) jacobian plus zinv, as int tuples per lane."""
        out = []
        for x, y, z in states:
            z2 = o.fq2_mul(z, z)
            z3 = o.fq2_mul(z2, z)
            out.append(
                (o.fq2_mul(x, z2), o.fq2_mul(y, z3), o.fq2_inv(z))
            )
        return out

    jt = [jac(s) for s in tops]
    jd = [jac(s) for s in dbls]

    def mont_limbs(vals):
        return F._cap_2p(F.to_mont(F.fp_from_ints(vals))).limbs

    def state_stream(js):
        arrs = []
        pad = None
        for t in range(STEPS):
            comps = [
                mont_limbs([js[t][b][0][0] for b in range(B)]),
                mont_limbs([js[t][b][0][1] for b in range(B)]),
                mont_limbs([js[t][b][1][0] for b in range(B)]),
                mont_limbs([js[t][b][1][1] for b in range(B)]),
            ]
            comps += comps[:2]  # placeholder Z rows (ignored)
            arr, pad = _comps_to_k(comps)
            arrs.append(arr)
        return jnp.stack(arrs), pad

    top_arr, pad = state_stream(jt)
    dbl_arr, _ = state_stream(jd)

    def zinv_stream():
        arrs = []
        for js in (jt, jd):
            for t in range(STEPS):
                comps = [
                    mont_limbs([js[t][b][2][0] for b in range(B)]),
                    mont_limbs([js[t][b][2][1] for b in range(B)]),
                ]
                arr, _ = _comps_to_k(comps)
                arrs.append(arr)
        return jnp.stack(arrs)

    zinv_arr = zinv_stream()
    pq_arr, _ = _comps_to_k(
        [
            mont_limbs(pxs),
            mont_limbs(pys),
            mont_limbs([q[0] for q in qxs]),
            mont_limbs([q[1] for q in qxs]),
            mont_limbs([q[0] for q in qys]),
            mont_limbs([q[1] for q in qys]),
        ]
    )

    tg, ch, line_bound = lines_pallas(top_arr, dbl_arr, zinv_arr, pq_arr, DIGITS, interpret=True)

    def decode(arr, t):
        comps = _k_to_comps(arr[t], (), (B,), pad)
        out = []
        for j in range(3):
            fp2 = F2.fp2_to_ints(
                F2.Fp2(
                    F.Fp(comps[2 * j], line_bound, F.SETTLED),
                    F.Fp(comps[2 * j + 1], line_bound, F.SETTLED),
                ),
                mont=True,
            )
            out.append([tuple(int(v) for v in row) for row in fp2])
        return out

    for t in range(STEPS):
        got_tg = decode(tg, t)
        for b in range(B):
            x, y, _ = tops[t][b]
            slots = o.sparse_line_function_equal((x, y), (pxs[b], pys[b]))
            assert got_tg[0][b] == slots[0]
            assert got_tg[1][b] == slots[3]
            assert got_tg[2][b] == slots[4]
        if DIGITS[t] == 0:
            continue
        got_ch = decode(ch, t)
        for b in range(B):
            cx, cy, _ = dbls[t][b]
            partner = (
                (qxs[b], qys[b])
                if DIGITS[t] > 0
                else (qxs[b], o.fq2_neg(qys[b]))
            )
            slots = o.sparse_line_function_unequal(
                (cx, cy), partner, (pxs[b], pys[b])
            )
            assert got_ch[0][b] == slots[2]
            assert got_ch[1][b] == slots[3]
            assert got_ch[2][b] == slots[5]


def _limb_int(row) -> int:
    """Raw integer encoded by a limb row (no Montgomery unwrap)."""
    v = 0
    for x in reversed(np.asarray(row, dtype=np.int64)):
        v = (v << F.RADIX_BITS) + int(x)
    return v


def test_lines_kernel_trajectory_bounds_export():
    """The exported-bounds path `_miller_pallas_resident` actually runs:
    state_bounds = curve_kernels.trajectory_bounds() with inputs that are
    REDUNDANT representatives right under those bounds (values far above
    2p), exercising the assembler's weak-reduce insertion and the
    uncapped line-output bound export (line_kernels.py state_bounds /
    line_bound plumbing). Asserts value-exact agreement with the oracle
    AND that every output limb row respects the exported static bound.

    CPU-CI analogue of the hardware check in tpu_validate.py (VERDICT r3
    weak item 5): 2 interpret grid steps keep this under ~a minute.
    """
    from pairing_tpu.ops.curve_kernels import trajectory_bounds
    from pairing_tpu.ops.line_kernels import lines_pallas
    from pairing_tpu.pairing.miller_loop import _comps_to_k, _k_to_comps

    rng = random.Random(4242)
    B2 = 2
    steps = 2
    digits = np.asarray([1, -1], np.int32)  # both chord partner signs
    tb = trajectory_bounds()
    (bx, by, _bz) = tb["top"]
    (bxd, byd, _bzd) = tb["dbl"]

    def fq2_rand():
        return (rng.randrange(P), rng.randrange(P))

    def redundant_limbs(vals, bound):
        """Montgomery limb rows of v*R + k*p chosen right under bound."""
        rows = []
        for v in vals:
            vm = v * F.R_MONT % P
            k = (int(bound) - vm) // P
            k = rng.randrange(max(1, k - 3), k + 1) if k > 0 else 0
            rows.append(np.asarray(F.int_to_limbs(vm + k * P), np.int64))
        return jnp.asarray(np.stack(rows).astype(np.int32))

    tops, dbls = [], []
    for _ in range(steps):
        tops.append([(fq2_rand(), fq2_rand(), fq2_rand()) for _ in range(B2)])
        dbls.append([(fq2_rand(), fq2_rand(), fq2_rand()) for _ in range(B2)])
    pxs = [rng.randrange(P) for _ in range(B2)]
    pys = [rng.randrange(P) for _ in range(B2)]
    qxs = [fq2_rand() for _ in range(B2)]
    qys = [fq2_rand() for _ in range(B2)]

    def jac(states):
        out = []
        for x, y, z in states:
            z2 = o.fq2_mul(z, z)
            z3 = o.fq2_mul(z2, z)
            out.append((o.fq2_mul(x, z2), o.fq2_mul(y, z3), o.fq2_inv(z)))
        return out

    jt = [jac(s) for s in tops]
    jd = [jac(s) for s in dbls]

    def state_stream(js, bxs, bys):
        arrs, pad = [], None
        for t in range(steps):
            comps = [
                redundant_limbs([js[t][b][0][0] for b in range(B2)], bxs),
                redundant_limbs([js[t][b][0][1] for b in range(B2)], bxs),
                redundant_limbs([js[t][b][1][0] for b in range(B2)], bys),
                redundant_limbs([js[t][b][1][1] for b in range(B2)], bys),
            ]
            comps += comps[:2]  # placeholder Z rows (ignored)
            arr, pad = _comps_to_k(comps)
            arrs.append(arr)
        return jnp.stack(arrs), pad

    top_arr, pad = state_stream(jt, bx, by)
    dbl_arr, _ = state_stream(jd, bxd, byd)

    def canon_limbs(vals):
        return redundant_limbs(vals, 2 * P)

    zarrs = []
    for js in (jt, jd):
        for t in range(steps):
            arr, _ = _comps_to_k(
                [
                    canon_limbs([js[t][b][2][0] for b in range(B2)]),
                    canon_limbs([js[t][b][2][1] for b in range(B2)]),
                ]
            )
            zarrs.append(arr)
    zinv_arr = jnp.stack(zarrs)
    pq_arr, _ = _comps_to_k(
        [
            canon_limbs(pxs),
            canon_limbs(pys),
            canon_limbs([q[0] for q in qxs]),
            canon_limbs([q[1] for q in qxs]),
            canon_limbs([q[0] for q in qys]),
            canon_limbs([q[1] for q in qys]),
        ]
    )

    tg, ch, line_bound = lines_pallas(
        top_arr, dbl_arr, zinv_arr, pq_arr, digits, interpret=True,
        state_bounds=((bx, by), (bxd, byd)),
    )
    # the redundant-state program must export a wider bound than 2p
    assert line_bound > 2 * P

    rinv = pow(F.R_MONT, -1, P)

    def decode_checked(arr, t):
        comps = _k_to_comps(arr[t], (), (B2,), pad)
        out = []
        for j in range(3):
            vals = []
            for b in range(B2):
                raw0 = _limb_int(comps[2 * j][b])
                raw1 = _limb_int(comps[2 * j + 1][b])
                assert raw0 < line_bound and raw1 < line_bound, (
                    f"output exceeds exported bound at t={t} j={j} b={b}"
                )
                vals.append((raw0 * rinv % P, raw1 * rinv % P))
            out.append(vals)
        return out

    for t in range(steps):
        got_tg = decode_checked(tg, t)
        got_ch = decode_checked(ch, t)
        for b in range(B2):
            x, y, _ = tops[t][b]
            slots = o.sparse_line_function_equal((x, y), (pxs[b], pys[b]))
            assert got_tg[0][b] == slots[0]
            assert got_tg[1][b] == slots[3]
            assert got_tg[2][b] == slots[4]
            cx, cy, _ = dbls[t][b]
            partner = (
                (qxs[b], qys[b])
                if digits[t] > 0
                else (qxs[b], o.fq2_neg(qys[b]))
            )
            slots = o.sparse_line_function_unequal(
                (cx, cy), partner, (pxs[b], pys[b])
            )
            assert got_ch[0][b] == slots[2]
            assert got_ch[1][b] == slots[3]
            assert got_ch[2][b] == slots[5]
