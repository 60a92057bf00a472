"""Staged per-phase device timing of the full pairing pipeline.

Times jitted PREFIXES of the pipeline; successive differences give the
real device cost of each phase (each measurement includes one ~55 ms
relay round-trip, which cancels in the differences):

  traj    — Phase B trajectory kernel (+ layout back-conversion)
  norm    — + epilogue points + Phase N bulk normalization
  lines   — + Phase C line evaluation
  miller  — + Phase D f-accumulation + epilogue muls (= full miller)
  easy    — + final_exp easy part
  full    — + hard part (= bench.py pipeline)

Usage: python staged_bench.py [stage ...]   (default: all)
"""

from __future__ import annotations

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.oracle import native as o
from pairing_tpu.utils import bn254 as c

BATCH = 2048


def make_inputs():
    rng = random.Random(7)
    n_unique = 16
    g1s = [o.g1_mul(c.G1_GEN, rng.randrange(1, c.R_SCALAR)) for _ in range(n_unique)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), rng.randrange(1, c.R_SCALAR))
        for _ in range(n_unique)
    ]
    reps = -(-BATCH // n_unique)
    return (
        G1m.g1_from_ints((g1s * reps)[:BATCH]),
        G2m.g2_from_ints((g2s * reps)[:BATCH]),
    )


def probe_scalar(x):
    """Tiny device-side reduction so the fetch is O(1) bytes."""
    leaves = jax.tree.leaves(x)
    return sum(jnp.sum(l[(0,) * (l.ndim - 1)][..., :1]) for l in leaves)


def stage_fns():
    from pairing_tpu.pairing import api, final_exp, miller_loop as ml
    from pairing_tpu.fields import fp as F

    def _core_prefix(q, p, upto):
        """Re-run _miller_core's phases up to a cut point."""
        qs = ml._add_pairs_axis(q)
        ps = ml._add_pairs_axis(p)
        from pairing_tpu.ops import dispatch

        if dispatch.use_pallas():
            tops, dbls, end_l = ml._trajectory_pallas(qs)
        else:
            tops, dbls, end_l = ml._trajectory(qs)
        if upto == "traj":
            return (tops, dbls, end_l)
        # epilogue points + phase N (duplicated from _miller_core)
        from pairing_tpu.curves.g2 import (
            G2,
            G2Jac,
            batch_to_affine,
            jac_mixed_add,
            neg_twisted_frobenius,
            twisted_frobenius,
        )
        from pairing_tpu.fields.fp2 import Fp2
        from pairing_tpu.fields import fp2 as F2

        q1 = twisted_frobenius(qs)
        nq2 = neg_twisted_frobenius(q1)
        end = ml._jac_from_limbs(end_l)
        st91 = ml._jac_cap(jac_mixed_add(end, q1))

        def cat(field_idx, comp):
            parts = [tops[field_idx][comp], dbls[field_idx][comp]]
            parts.append(end_l[field_idx][comp][None])
            st = ml._jac_to_limbs(st91)
            parts.append(st[field_idx][comp][None])
            return jnp.concatenate(parts, axis=0)

        stack = G2Jac(
            Fp2(F.Fp(cat(0, 0), 2 * F.P, F.SETTLED), F.Fp(cat(0, 1), 2 * F.P, F.SETTLED)),
            Fp2(F.Fp(cat(1, 0), 2 * F.P, F.SETTLED), F.Fp(cat(1, 1), 2 * F.P, F.SETTLED)),
            Fp2(F.Fp(cat(2, 0), 2 * F.P, F.SETTLED), F.Fp(cat(2, 1), 2 * F.P, F.SETTLED)),
        )
        aff = batch_to_affine(stack)
        if upto == "norm":
            return aff
        # phase C: reuse the real code by slicing out of _miller_core is
        # impractical; call the line helpers like _miller_core does.
        from pairing_tpu.pairing import lines

        ax, ay = aff.x, aff.y

        def slice_fp2(v, sl):
            return Fp2(
                F.Fp(v.c0.limbs[sl], v.c0.bound, v.c0.limb_bound),
                F.Fp(v.c1.limbs[sl], v.c1.bound, v.c1.limb_bound),
            )

        px_b = F._cap_2p(ps.x)
        py_b = F._cap_2p(ps.y)
        tg = lines.line_equal(
            slice_fp2(ax, slice(0, 64)), slice_fp2(ay, slice(0, 64)), px_b, py_b
        )
        add_idx = np.asarray([64 + t for t in ml.ADD_STEPS], dtype=np.int32)
        ch_r_x = slice_fp2(ax, jnp.asarray(add_idx))
        ch_r_y = slice_fp2(ay, jnp.asarray(add_idx))
        from pairing_tpu.curves.g2 import g2_neg

        nqs = g2_neg(qs)
        partner = [(qs if ml.STEP_DIGITS[t] == 1 else nqs) for t in ml.ADD_STEPS]
        pa_x = ml._stack_fp2([pp.x for pp in partner])
        pa_y = ml._stack_fp2([pp.y for pp in partner])
        ch = lines.line_unequal(ch_r_x, ch_r_y, pa_x, pa_y, px_b, py_b)
        e1 = lines.line_unequal(
            slice_fp2(ax, 128), slice_fp2(ay, 128), q1.x, q1.y, px_b, py_b
        )
        e2 = lines.line_unequal(
            slice_fp2(ax, 129), slice_fp2(ay, 129), nq2.x, nq2.y, px_b, py_b
        )
        return (tg, ch, e1, e2)

    fns = {
        "traj": lambda p, q: _core_prefix(q, p, "traj"),
        "norm": lambda p, q: _core_prefix(q, p, "norm"),
        "lines": lambda p, q: _core_prefix(q, p, "lines"),
        "miller": lambda p, q: ml.miller_loop(q, p),
        "easy": lambda p, q: final_exp.easy_part(ml.miller_loop(q, p)),
        "full": lambda p, q: api.pairing(p, q),
    }
    return {k: jax.jit(lambda p, q, f=f: probe_scalar(f(p, q))) for k, f in fns.items()}


def main():
    which = sys.argv[1:] or ["traj", "norm", "lines", "miller", "easy", "full"]
    p, q = make_inputs()
    fns = stage_fns()
    results = {}
    for name in which:
        fn = fns[name]
        t0 = time.time()
        np.asarray(fn(p, q))  # compile + run
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(p, q))
            best = min(best, time.time() - t0)
        results[name] = best
        print(f"{name}: {best*1e3:.1f} ms", flush=True)
    print("== summary (incl. ~55ms relay each) ==")
    prev = 0.0
    for name in which:
        t = results[name]
        print(f"{name}: {t*1e3:7.1f} ms   delta {(t-prev)*1e3:7.1f} ms")
        prev = t
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
