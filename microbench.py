"""Microbenchmarks: per-op timing on the attached accelerator.

Usage: python microbench.py [op] [batch]
Ops: fq12_mul_xla, fq12_mul_pallas, fq12_chain_xla, fq12_chain_pallas,
     miller_xla, finalexp_xla
"""

from __future__ import annotations

import random
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pairing_tpu.fields import fp12 as F12
from pairing_tpu.ops import fq12_kernels as OK
from pairing_tpu.utils.bn254 import P


def sync(tree):
    jax.block_until_ready(tree)
    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(leaf).ravel()[0]


def timeit(fn, *args, iters=5):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        times.append(time.time() - t0)
    return compile_s, min(times)


def main():
    op = sys.argv[1] if len(sys.argv) > 1 else "fq12_mul_pallas"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rng = random.Random(3)
    xs = [[rng.randrange(P) for _ in range(12)] for _ in range(batch)]
    ys = [[rng.randrange(P) for _ in range(12)] for _ in range(batch)]
    a = F12.fq12_from_int_coeffs(xs)
    b = F12.fq12_from_int_coeffs(ys)

    if op == "fq12_mul_xla":
        fn = jax.jit(F12.fq12_mul)
        cs, t = timeit(fn, a, b)
    elif op == "fq12_mul_pallas":
        fn = jax.jit(lambda a, b: OK.fq12_mul_pallas(a, b))
        cs, t = timeit(fn, a, b)
    elif op == "fq12_chain_xla":

        @jax.jit
        def fn(a, b):
            from pairing_tpu.pairing.miller_loop import fq12_cap

            for _ in range(16):
                a = fq12_cap(F12.fq12_mul(a, b))
            return a

        cs, t = timeit(fn, a, b)
        t /= 16
    elif op == "fq12_chain_pallas":

        @jax.jit
        def fn(a, b):
            for _ in range(16):
                a = OK.fq12_mul_pallas(a, b)
            return a

        cs, t = timeit(fn, a, b)
        t /= 16
    elif op in ("miller", "finalexp", "trajectory", "easy", "hard", "pow1"):
        import random as _r

        from pairing_tpu.curves import g1 as G1m
        from pairing_tpu.curves import g2 as G2m
        from pairing_tpu.oracle import native as o
        from pairing_tpu.pairing import final_exp as FE
        from pairing_tpu.pairing import miller_loop as ML
        from pairing_tpu.utils import bn254 as c

        rng2 = _r.Random(5)
        n_unique = 8
        g1s = [o.g1_mul(c.G1_GEN, rng2.randrange(1, c.R_SCALAR)) for _ in range(n_unique)]
        g2s = [o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), rng2.randrange(1, c.R_SCALAR)) for _ in range(n_unique)]
        reps = -(-batch // n_unique)
        p = G1m.g1_from_ints((g1s * reps)[:batch])
        q = G2m.g2_from_ints((g2s * reps)[:batch])

        if op == "miller":
            fn = jax.jit(ML.miller_loop)
            cs, t = timeit(fn, q, p)
        elif op == "trajectory":

            @jax.jit
            def fn(q):
                import jax as _j

                qs = _j.tree.map(lambda a: a[None], q)
                tops, dbls, end = ML._trajectory(qs)
                return end

            cs, t = timeit(fn, q)
        else:
            m = jax.jit(ML.miller_loop)(q, p)
            jax.block_until_ready(m)
            if op == "finalexp":
                fn = jax.jit(FE.final_exp)
            elif op == "easy":
                fn = jax.jit(FE.easy_part)
            elif op == "hard":
                m = jax.jit(FE.easy_part)(m)
                jax.block_until_ready(m)
                fn = jax.jit(FE.hard_part)
            elif op == "pow1":
                m = jax.jit(FE.easy_part)(m)
                jax.block_until_ready(m)
                fn = jax.jit(FE.pow_x_cyclotomic)
            cs, t = timeit(fn, m)
    else:
        raise SystemExit(f"unknown op {op}")

    per_sec = batch / t
    print(
        f"{op}: batch={batch} compile={cs:.1f}s best={t*1e3:.3f}ms "
        f"-> {per_sec:,.0f} fq12-ops/s"
    )


if __name__ == "__main__":
    main()
