"""Full-length kernel validation on real TPU hardware.

CPU interpret mode unrolls pallas grids (untestably slow for 60-250-step
ladders), so bit-exactness of the full-length fused kernels vs the oracle
is validated here, on the hardware where grids execute natively.

Run: python tpu_validate.py [--fast]
"""

import random
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.fields import fp as F
from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.ops import dispatch
from pairing_tpu.pairing import api, final_exp
from pairing_tpu.utils import bn254 as c

RNG = random.Random(90210)


def check(name, fn):
    t0 = time.time()
    fn()
    print(f"PASS {name} ({time.time()-t0:.1f}s)", flush=True)


def main():
    assert jax.devices()[0].platform == "tpu", "requires TPU"
    print(f"device: {jax.devices()[0]}", flush=True)

    g1p = o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR))
    g2p = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))

    def t_fp_inv():
        xs = [RNG.randrange(1, c.P) for _ in range(4)]
        a = F.to_mont(F.fp_from_ints(xs))
        dispatch.force_backend("pallas")
        try:
            inv = jax.jit(F.fp_inv)(a)
        finally:
            dispatch.force_backend(None)
        vals = F.fp_to_ints(F.canonical(F.from_mont(inv)))
        for x, v in zip(xs, vals):
            assert v * x % c.P == 1

    def t_pow_ladder():
        m_int = o.easy_part(o.miller_loop(g2p, g1p))
        m = F12.fq12_from_int_coeffs([m_int])
        dispatch.force_backend("pallas")
        try:
            got = jax.jit(final_exp.pow_x_cyclotomic)(m)
        finally:
            dispatch.force_backend(None)
        assert F12.fq12_to_int_coeffs(got) == [o.pow_fq12(m_int, c.BN_X)]

    def t_pairing():
        p = G1m.g1_from_ints([g1p])
        q = G2m.g2_from_ints([g2p])
        dispatch.force_backend("pallas")
        try:
            e = jax.jit(api.pairing)(p, q)
        finally:
            dispatch.force_backend(None)
        assert F12.fq12_to_int_coeffs(e) == [o.pairing(g1p, g2p)]

    def t_determinism():
        # repeat-run bit-exactness (the TPU analogue of the reference's
        # "race detection: none needed" — SURVEY.md §5)
        p = G1m.g1_from_ints([g1p] * 4)
        q = G2m.g2_from_ints([g2p] * 4)
        dispatch.force_backend("pallas")
        try:
            fn = jax.jit(api.pairing)
            a = F12.fq12_to_int_coeffs(fn(p, q))
            b = F12.fq12_to_int_coeffs(fn(p, q))
        finally:
            dispatch.force_backend(None)
        assert a == b
        assert a[0] == a[1] == a[2] == a[3]

    def t_multi_k4():
        # K=4 exercises the fused kernel's (batch, step, pair) grid with
        # shared squarings across all four pairs
        K = 4
        g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(K)]
        g2s = [
            o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
            for _ in range(K)
        ]
        from pairing_tpu.pairing import miller_loop as ML

        dispatch.force_backend("pallas")
        try:
            f = jax.jit(ML.multi_miller_loop)(
                G2m.g2_from_ints(g2s), G1m.g1_from_ints(g1s)
            )
        finally:
            dispatch.force_backend(None)
        assert F12.fq12_to_int_coeffs(f) == [
            o.multi_miller_loop(list(zip(g1s, g2s)))
        ]

    def t_klayout_ops():
        # kernel-layout-resident conj/frobenius/cyc-sq/inv vs the oracle
        from pairing_tpu.ops import fq12_kernels as OK
        from pairing_tpu.ops import klayout as KL

        m_int = o.easy_part(o.miller_loop(g2p, g1p))  # cyclotomic
        r_int = [RNG.randrange(1, c.P) for _ in range(12)]
        a = F12.fq12_from_int_coeffs([m_int, r_int])
        arr, bs, pad = OK.to_kernel_layout(a)

        def run(arr):
            return (
                KL.kconj(arr),
                KL.kfrob(arr, 1),
                KL.kfrob(arr, 3),
                KL.kcyc_sq(arr),
                KL.kinv(arr),
            )

        dispatch.force_backend("pallas")
        try:
            outs = jax.jit(run)(arr)
        finally:
            dispatch.force_backend(None)
        got = [
            F12.fq12_to_int_coeffs(OK.from_kernel_layout(o_, bs, pad))
            for o_ in outs
        ]
        for x, (gc, g1f, g3f, gcs, gi) in zip(
            [m_int, r_int], zip(*got)
        ):
            assert gc == o.fq12_conj(x)
            assert g1f == o.frobenius_map(x, 1)
            assert g3f == o.frobenius_map(x, 3)
            assert gi == o.fq12_inv(x)
        # cyc-sq is only claimed on the cyclotomic subgroup
        assert got[3][0] == o.fq12_mul(m_int, m_int)

    def t_witness_kernel():
        # witness path on the production fused kernel (collect mode): the
        # full npz-exported trace must replay-verify against the int
        # oracle, transition by transition
        import tempfile

        from pairing_tpu.witness import (
            check_pairing_constraints,
            load_pairing_witness,
            save_pairing_witness,
            verify_pairing_witness,
        )
        from pairing_tpu.witness.trace import pairing_witness

        p = G1m.g1_from_ints([g1p])
        q = G2m.g2_from_ints([g2p])
        dispatch.force_backend("pallas")
        try:
            out, trace = pairing_witness(p, q)
        finally:
            dispatch.force_backend(None)
        assert F12.fq12_to_int_coeffs(out) == [o.pairing(g1p, g2p)]
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/w.npz"
            save_pairing_witness(path, p, q, out, trace)
            meta, data = load_pairing_witness(path)
            counts = verify_pairing_witness(meta, data)  # raises on failure
            assert counts
            # limb-level AIR identities over the same columns
            assert check_pairing_constraints(meta, data)

    def t_witness_multi():
        # K=2 Groth16-shape witness through the RESIDENT collect path
        # (lanes = K * inner = 1024, the per-pair lane-split case): the
        # trace must replay-verify with shared squarings across pairs
        import tempfile

        import jax.numpy as _jnp

        from pairing_tpu.witness import (
            check_pairing_constraints,
            load_pairing_witness,
            save_pairing_witness,
            verify_pairing_witness,
        )
        from pairing_tpu.witness.trace import multi_pairing_witness

        # per-pair lanes must tile to whole (8, 128) blocks for the
        # resident collect path: B = 1024 -> r_in = 8 rows per pair
        K, B = 2, 1024
        g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(K * B)]
        g2s = [
            o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
            for _ in range(K * B)
        ]
        resh = lambda a: _jnp.moveaxis(a.reshape((B, K) + a.shape[1:]), 0, 1)
        p = jax.tree.map(resh, G1m.g1_from_ints(g1s))
        q = jax.tree.map(resh, G2m.g2_from_ints(g2s))
        dispatch.force_backend("pallas")
        try:
            out, trace = multi_pairing_witness(p, q)
        finally:
            dispatch.force_backend(None)
        got = F12.fq12_to_int_coeffs(out)
        for b in range(2):
            pairs = [(g1s[K * b + j], g2s[K * b + j]) for j in range(K)]
            assert got[b] == o.final_exp(o.multi_miller_loop(pairs))
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/mw.npz"
            save_pairing_witness(path, p, q, out, trace)
            meta, data = load_pairing_witness(path)
            assert meta["k"] == K
            assert verify_pairing_witness(meta, data, lanes=[0, 1])
            # K=2 limb-level constraint path (shared-squaring chain with
            # per-pair factor columns) on the hardware-generated trace
            assert check_pairing_constraints(meta, data, lanes=[0, 1])

    def t_subgroup_check():
        bad = None
        for x0 in range(1, 200):
            cand = o.g2_point_from_x((x0, 1))
            if cand is not None and not o.g2_in_subgroup(cand):
                bad = cand
                break
        p = G1m.g1_from_ints([g1p, g1p])
        q = G2m.g2_from_ints([g2p, bad])
        dispatch.force_backend("pallas")
        try:
            mask = jax.jit(api.validate_inputs)(p, q)
        finally:
            dispatch.force_backend(None)
        assert mask.tolist() == [True, False]

    checks = [
        ("klayout conj/frob/cyc/inv", t_klayout_ops),
        ("fp_inv pallas ladder", t_fp_inv),
        ("pow_x pallas ladder", t_pow_ladder),
        ("full pairing pallas backend", t_pairing),
        ("repeat-run determinism", t_determinism),
        ("multi-miller K=4 group split", t_multi_k4),
        ("witness trace on fused kernel", t_witness_kernel),
        ("multi-pairing witness K=2 (resident collect)", t_witness_multi),
        ("G2 subgroup validation", t_subgroup_check),
    ]
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    ran = 0
    for name, fn in checks:
        if only and not any(s.lower() in name.lower() for s in only):
            continue
        check(name, fn)
        ran += 1
    assert ran, f"no check matches filter {only}"
    print("ALL PASS", flush=True)


if __name__ == "__main__":
    main()
