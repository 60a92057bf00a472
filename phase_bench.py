"""Per-phase device timing of the CURRENT resident pairing pipeline.

Splits api.pairing's dataflow at phase boundaries and times each stage as
its own jit (inputs precomputed and device-resident), so the sum of
stages ~ the full pipeline and the dominant stage is unambiguous:

  traj    — phase B: trajectory kernel (64 Jacobian steps)
  norm    — phase N: z-stack prefix products + total inverse + unroll
  lines   — phase C: tangent/chord line kernel (affine fold-in)
  miller  — phase D: fused f kernel + fused epilogue steps
  finexp  — final_exp_k chain (easy + hard part)

Usage: python phase_bench.py [--batch 2048] [--iters 5]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timed(fn, args, iters):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import random

    from pairing_tpu.curves import g1 as G1m
    from pairing_tpu.curves import g2 as G2m
    from pairing_tpu.oracle import native as o
    from pairing_tpu.pairing import api
    from pairing_tpu.utils import bn254 as c

    rng = random.Random(7)
    n_unique = 8
    g1s = [o.g1_mul(c.G1_GEN, rng.randrange(1, c.R_SCALAR)) for _ in range(n_unique)]
    g2s = [o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), rng.randrange(1, c.R_SCALAR))
           for _ in range(n_unique)]
    reps = -(-args.batch // n_unique)
    p = G1m.g1_from_ints((g1s * reps)[: args.batch])
    q = G2m.g2_from_ints((g2s * reps)[: args.batch])

    from pairing_tpu.fields import fp as F
    from pairing_tpu.fields import fp2 as F2
    from pairing_tpu.pairing import final_exp as FE
    from pairing_tpu.pairing import miller_loop as ML
    from pairing_tpu.pairing.miller_loop import (
        N_STEPS,
        STEP_DIGITS,
        _add_pairs_axis,
        _comps_to_k,
        _g2_to_traj_k,
    )

    qs = _add_pairs_axis(q)
    ps = _add_pairs_axis(p)
    digits = np.asarray(STEP_DIGITS, np.int32)

    results = {}

    # --- phase B: trajectory ---
    from pairing_tpu.ops.curve_kernels import trajectory_pallas

    @jax.jit
    def run_traj(qs):
        q_arr, _ = _g2_to_traj_k(qs)
        return trajectory_pallas(q_arr, digits)

    results["traj"], (tops_k, dbls_k, end_k) = timed(run_traj, (qs,), args.iters)

    # --- phase N: normalization (z prefix products + inverse + unroll) ---
    from pairing_tpu.curves.g2 import G2Jac, jac_mixed_add, twisted_frobenius
    from pairing_tpu.fields.fp2 import Fp2
    from pairing_tpu.ops.fq2_vm import fp2s_to_vm, vm_to_fp2s
    from pairing_tpu.ops.norm_kernels import (
        prefix_products_pallas,
        running_inverse_pallas,
    )
    from pairing_tpu.pairing.miller_loop import _jac_cap, _k_to_comps

    kbatch = qs.batch_shape
    q1 = twisted_frobenius(qs)

    from pairing_tpu.ops.curve_kernels import trajectory_bounds

    tb = trajectory_bounds()

    @jax.jit
    def run_norm(tops_k, dbls_k, end_k, q1):
        nrows_kb = tops_k.shape[3]
        e6 = _k_to_comps(end_k, (), kbatch, 0)
        end = G2Jac(
            Fp2(F.Fp(e6[0], tb["top"][0], F.SETTLED), F.Fp(e6[1], tb["top"][0], F.SETTLED)),
            Fp2(F.Fp(e6[2], tb["top"][1], F.SETTLED), F.Fp(e6[3], tb["top"][1], F.SETTLED)),
            Fp2(F.Fp(e6[4], tb["top"][2], F.SETTLED), F.Fp(e6[5], tb["top"][2], F.SETTLED)),
        )
        st91 = _jac_cap(jac_mixed_add(end, q1))
        st91_k, _ = _comps_to_k(
            [st91.X.c0.limbs, st91.X.c1.limbs,
             st91.Y.c0.limbs, st91.Y.c1.limbs,
             st91.Z.c0.limbs, st91.Z.c1.limbs]
        )
        z_stack = jnp.concatenate(
            [tops_k[:, 4:6], dbls_k[:, 4:6], end_k[None, 4:6],
             st91_k.reshape(3, 2, F.NLIMBS, nrows_kb, 128)[None, 2]],
            axis=0,
        )
        z_bound = max(tb["top"][2], tb["dbl"][2], 2 * F.P)
        prefix, total = prefix_products_pallas(z_stack, z_bound=z_bound)
        (total_fp2,) = vm_to_fp2s(total[None], (nrows_kb * 128,), 0)
        tinv = F2.cap(F2.inv(total_fp2))
        tinv_arr, _, _ = fp2s_to_vm([tinv])
        zinv = running_inverse_pallas(z_stack, prefix, tinv_arr[0],
                                      z_bound=z_bound)
        return zinv, st91_k

    results["norm"], (zinv, st91_k) = timed(
        run_norm, (tops_k, dbls_k, end_k, q1), args.iters
    )

    # --- phase C: lines kernel ---
    from pairing_tpu.ops.line_kernels import lines_pallas

    @jax.jit
    def run_lines(tops_k, dbls_k, zinv, ps, qs):
        px = F._cap_2p(ps.x)
        py = F._cap_2p(ps.y)
        pq_arr, _ = _comps_to_k(
            [px.limbs, py.limbs,
             F._cap_2p(qs.x.c0).limbs, F._cap_2p(qs.x.c1).limbs,
             F._cap_2p(qs.y.c0).limbs, F._cap_2p(qs.y.c1).limbs]
        )
        from pairing_tpu.ops.curve_kernels import trajectory_bounds
        tb = trajectory_bounds()
        tg, ch, _ = lines_pallas(
            tops_k, dbls_k, zinv, pq_arr, digits,
            state_bounds=((tb["top"][0], tb["top"][1]),
                          (tb["dbl"][0], tb["dbl"][1])),
        )
        return tg, ch

    results["lines"], (tg_s, ch_s) = timed(
        run_lines, (tops_k, dbls_k, zinv, ps, qs), args.iters
    )

    # --- phase D: fused miller f kernel (64 steps, no epilogue lines) ---
    from pairing_tpu.ops.fused_kernels import miller_f_pallas

    flags_np = np.asarray([1 if d != 0 else 0 for d in STEP_DIGITS], np.int32)

    @jax.jit
    def run_miller(tg_s, ch_s):
        return miller_f_pallas(tg_s, ch_s, flags_np, 1)

    results["miller"], f_arr = timed(run_miller, (tg_s, ch_s), args.iters)

    # --- final exp chain ---
    @jax.jit
    def run_fe(f_arr):
        return FE.final_exp_k(f_arr)

    results["finexp"], _ = timed(run_fe, (f_arr,), args.iters)

    # --- whole pipeline for reference ---
    fn = jax.jit(api.pairing)
    results["full"], _ = timed(fn, (p, q), args.iters)

    total = sum(v for k, v in results.items() if k != "full")
    for k, v in results.items():
        print(f"{k:8s} {v*1e3:8.2f} ms")
    print(f"{'sum':8s} {total*1e3:8.2f} ms (vs full {results['full']*1e3:.2f};"
          f" gap = dispatch/relay + inter-phase glue)")


if __name__ == "__main__":
    main()
