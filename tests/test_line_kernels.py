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

pytestmark = pytest.mark.skipif(
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
                ((cx, cy), partner), (pxs[b], pys[b])
            )
            assert got_ch[0][b] == slots[2]
            assert got_ch[1][b] == slots[3]
            assert got_ch[2][b] == slots[5]
