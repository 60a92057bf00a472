"""Final-exp sub-stage timing: where do its ~128 ms (batch 16384) go?

Stages (kernel layout in/out, inputs device-resident):
  kinv     — tower inversion (easy part's division)
  easy     — full easy part (conj, kinv, mul, frob, mul)
  kpow     — ONE x-power w4 ladder (62 cyc-sq + 13 window muls)
  hard     — full hard part (3 ladders + 13-mul chain)
  kmul     — one dense mul (reference unit)
  kcyc     — one cyclotomic square (reference unit)
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timed(fn, args, iters=4):
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
    ap.add_argument("--batch", type=int, default=16384)
    args = ap.parse_args()

    import random

    from pairing_tpu.fields import fp12 as F12
    from pairing_tpu.oracle import native as o
    from pairing_tpu.ops import klayout as KL
    from pairing_tpu.ops.fq12_kernels import to_kernel_layout
    from pairing_tpu.pairing import final_exp as FE
    from pairing_tpu.utils import bn254 as c

    rng = random.Random(3)
    g1 = o.g1_mul(c.G1_GEN, rng.randrange(1, c.R_SCALAR))
    g2 = o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), rng.randrange(1, c.R_SCALAR))
    m_int = o.miller_loop(g2, g1)
    a = F12.fq12_from_int_coeffs([m_int] * args.batch)
    arr, _, _ = to_kernel_layout(a)
    arr = jax.device_put(arr)
    sync(arr)

    stages = {
        "kmul": jax.jit(lambda x: KL.kmul(x, x)),
        "kcyc": jax.jit(KL.kcyc_sq),
        "kinv": jax.jit(KL.kinv),
        "easy": jax.jit(FE.easy_part_k),
        "kpow": jax.jit(KL.kpow_x),
        "hard": jax.jit(FE.hard_part_k),
        "full": jax.jit(FE.final_exp_k),
    }
    out = arr
    for name, fn in stages.items():
        t, out = timed(fn, (arr,))
        print(f"{name:6s} {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
