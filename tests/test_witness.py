"""Witness-generation tests (BASELINE config 4; reference tier-2/3 analogue).

The reference proves circuit == native by *proving* (SURVEY.md §4 tier 2);
the TPU analogue checks that every emitted trace value is consistent with
the oracle's intermediate values — which is precisely what the downstream
circuit would constrain.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.pairing.miller_loop import _fq12_from_limbs
from pairing_tpu.utils import bn254 as c
from pairing_tpu.witness import trace as W

RNG = random.Random(31337)


def rand_fq12_batch(n):
    return [[RNG.randrange(c.P) for _ in range(12)] for _ in range(n)]


def test_fq12_exp_u64():
    B = 2
    xs = rand_fq12_batch(B)
    offs = rand_fq12_batch(B)
    exps = [RNG.randrange(1 << 63) for _ in range(B)]
    inp = W.ExpU64Input(
        x=F12.fq12_from_int_coeffs(xs),
        offset=F12.fq12_from_int_coeffs(offs),
        exp_bits=W.exp_bits_from_u64(exps),
    )
    out, rows = jax.jit(lambda i: W.fq12_exp_u64(i, collect_trace=True))(inp)
    got = F12.fq12_to_int_coeffs(out)
    expect = [
        o.fq12_mul(off, o.pow_fq12(x, e)) for x, off, e in zip(xs, offs, exps)
    ]
    assert got == expect
    # trace rows: row[63] must equal x^exp (before offset)
    last = F12.fq12_to_int_coeffs(_fq12_from_limbs(jax.tree.map(lambda a: a[-1], rows)))
    assert last == [o.pow_fq12(x, e) for x, e in zip(xs, exps)]
    # row recurrence spot check: row[i] == row[i-1]^2 * x^bit
    mid = F12.fq12_to_int_coeffs(_fq12_from_limbs(jax.tree.map(lambda a: a[40], rows)))
    prev = F12.fq12_to_int_coeffs(_fq12_from_limbs(jax.tree.map(lambda a: a[39], rows)))
    for b in range(B):
        bit = (exps[b] >> (63 - 40)) & 1
        expect_mid = o.fq12_mul(prev[b], prev[b])
        if bit:
            expect_mid = o.fq12_mul(expect_mid, xs[b])
        assert mid[b] == expect_mid


def test_miller_witness_trace_consistency():
    g1 = o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR))
    g2 = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
    p = G1m.g1_from_ints([g1])
    q = G2m.g2_from_ints([g2])
    f, tr = jax.jit(lambda q, p: W.miller_loop_witness(q, p))(q, p)
    assert F12.fq12_to_int_coeffs(f) == [o.miller_loop(g2, g1)]

    # trace: f after step 0 is the first tangent line embedded
    f0 = F12.fq12_to_int_coeffs(
        _fq12_from_limbs(jax.tree.map(lambda a: a[0], tr["f_steps"]))
    )[0]
    sparse = o.sparse_line_function_equal(g2, g1)
    line_embed = o.fq12_from_fq2_slots(sparse)
    # step 0 also includes the digit-63 chord (NAF[63]=1): f = line * chord(2Q, Q)
    r1 = o.g2_double(g2)
    chord = o.sparse_line_function_unequal(r1, g2, g1)
    expect0 = o.sparse_fp12_multiply(line_embed, chord)
    assert f0 == expect0

    # affine trajectory spot checks: top[0] == Q, dbl[0] == 2Q
    aff = tr["r_affine"]
    tops = G2m.g2_to_ints(
        G2m.G2(
            jax.tree.map(lambda a: a[0, 0], aff.x),
            jax.tree.map(lambda a: a[0, 0], aff.y),
        )
    )[0]
    assert tops == g2
    dbl0 = G2m.g2_to_ints(
        G2m.G2(
            jax.tree.map(lambda a: a[64, 0], aff.x),
            jax.tree.map(lambda a: a[64, 0], aff.y),
        )
    )[0]
    assert dbl0 == r1


def test_final_exp_witness():
    g1 = o.g1_mul(c.G1_GEN, 3)
    g2 = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), 5)
    m_int = o.miller_loop(g2, g1)
    m = F12.fq12_from_int_coeffs([m_int])
    out, tr = jax.jit(W.final_exp_witness)(m)
    assert F12.fq12_to_int_coeffs(out) == [o.final_exp(m_int)]
    # exp offload outputs must be the three x-powers of the easy part
    f0 = o.easy_part(m_int)
    mx = o.pow_fq12(f0, c.BN_X)
    mx2 = o.pow_fq12(mx, c.BN_X)
    mx3 = o.pow_fq12(mx2, c.BN_X)
    got = [F12.fq12_to_int_coeffs(x)[0] for x in tr["exp_outputs"]]
    assert got == [mx, mx2, mx3]
    assert F12.fq12_to_int_coeffs(tr["easy_part_out"]) == [f0]


def test_multi_pairing_witness_serialize_verify(tmp_path):
    """Groth16-shape witness (K=2 product, shared squarings, one final
    exp): end-to-end trace -> npz -> replay verification."""
    from pairing_tpu.witness import (
        load_pairing_witness,
        save_pairing_witness,
        verify_pairing_witness,
    )

    K = 2
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(K)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(K)
    ]
    ps = G1m.g1_from_ints(g1s)
    qs = G2m.g2_from_ints(g2s)
    out, tr = jax.jit(W.multi_pairing_witness)(ps, qs)
    expect = o.final_exp(o.multi_miller_loop(list(zip(g1s, g2s))))
    assert F12.fq12_to_int_coeffs(out) == [expect]
    path = str(tmp_path / "mw.npz")
    save_pairing_witness(path, ps, qs, out, tr)
    meta, data = load_pairing_witness(path)
    assert meta["k"] == K
    counts = verify_pairing_witness(meta, data)
    assert counts


def test_multi_miller_witness():
    # reference test_multi_miller_loop_target analogue (SURVEY.md §4 tier 2)
    K = 2
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(K)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(K)
    ]
    ps = G1m.g1_from_ints(g1s)
    qs = G2m.g2_from_ints(g2s)
    f, tr = jax.jit(lambda q, p: W.multi_miller_loop_witness(q, p))(qs, ps)
    assert F12.fq12_to_int_coeffs(f) == [
        o.multi_miller_loop(list(zip(g1s, g2s)))
    ]
    # trajectory spot check: per-pair top states equal the Q inputs
    aff = tr["r_affine"]
    for k in range(K):
        top = G2m.g2_to_ints(
            G2m.G2(
                jax.tree.map(lambda a: a[0, k], aff.x),
                jax.tree.map(lambda a: a[0, k], aff.y),
            )
        )[0]
        assert top == g2s[k]


def test_witness_stream_chunks():
    """Streamed (chunked, copy-overlap) witness generation yields exactly
    the same host arrays as one-shot generation on each chunk's lanes."""
    from pairing_tpu.witness.stream import witness_stream

    n, chunk = 4, 2
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(n)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(n)
    ]
    p = G1m.g1_from_ints(g1s)
    q = G2m.g2_from_ints(g2s)

    starts = []
    fn = jax.jit(W.pairing_witness)
    for start, out_h, tr_h in witness_stream(p, q, chunk):
        starts.append(start)
        ps = jax.tree.map(lambda a: a[start : start + chunk], p)
        qs = jax.tree.map(lambda a: a[start : start + chunk], q)
        out_d, tr_d = fn(ps, qs)
        got = jax.tree.leaves((out_h, tr_h))
        want = jax.tree.leaves(jax.device_get((out_d, tr_d)))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        # and the pairing result itself is right per-lane
        for i in range(chunk):
            lane = jax.tree.map(lambda a: a[i : i + 1], out_d)
            assert F12.fq12_to_int_coeffs(lane) == [
                o.pairing(g1s[start + i], g2s[start + i])
            ]
    assert starts == [0, 2]
