"""Raw MAC-rate probes: what does one multiply-accumulate cost on this chip?

The kernel roofline (PERF.md) prices everything in int32 vector ops; this
probe pins the actual retire rate of the three candidate MAC engines so
optimization effort goes to the real bottleneck:

  imul   — int32 tile multiply + add chain (the current kernels' MAC)
  iadd   — int32 tile add chain (carry-op cost unit)
  fma    — f32 tile multiply + add chain (candidate 9-bit-radix layer)
  shift  — int32 arithmetic shift + and chain (carry decompose unit)
  mxu8   — jnp.dot int8[128,128] x int8[128,128] -> int32 per step
  mxuf   — jnp.dot f32[128,128] x f32[128,128] per step

Each probe runs a grid of (1, steps) with DEPTH independent chains per
step to expose ILP; slope between steps=S0 and steps=S1 isolates the
per-step cost from dispatch. Throughput printed as tile-ops/s (one
tile-op = one [8,128] lane op) or MXU matmuls/s.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

DEPTH = 8      # independent chains (ILP)
INNER = 64     # ops per chain per grid step


def _vec_kernel(op, n_steps, x_ref, out_ref, acc):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[...] = x_ref[...]

    for d in range(DEPTH):
        v = acc[d]
        m = x_ref[d]
        for _ in range(INNER):
            if op == "imul":
                v = v * m + m
            elif op == "iadd":
                v = v + m
            elif op == "fma":
                v = v * m + m
            elif op == "shift":
                v = (v >> 13) + (m & 0x1FFF)
        acc[d] = v

    @pl.when(t == n_steps - 1)
    def _():
        out_ref[...] = acc[...]


def _mxu_kernel(dtype, n_steps, a_ref, b_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    a = a_ref[...]
    b = b_ref[...]
    partial_sum = jnp.dot(a, b, preferred_element_type=jnp.int32
                          if dtype == jnp.int8 else jnp.float32)
    out_ref[...] = out_ref[...] + partial_sum.astype(out_ref.dtype)


def build_vec(op, n_steps):
    dt = jnp.float32 if op == "fma" else jnp.int32
    blk = pl.BlockSpec((DEPTH, 8, 128), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM)

    def fn(x):
        return pl.pallas_call(
            partial(_vec_kernel, op, n_steps),
            out_shape=jax.ShapeDtypeStruct((DEPTH, 8, 128), dt),
            grid=(n_steps,),
            in_specs=[blk],
            out_specs=blk,
            scratch_shapes=[pltpu.VMEM((DEPTH, 8, 128), dt)],
        )(x)

    return jax.jit(fn), dt


def build_mxu(dtype, n_steps):
    blk_in = pl.BlockSpec((128, 128), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    out_dt = jnp.int32 if dtype == jnp.int8 else jnp.float32
    blk_out = pl.BlockSpec((128, 128), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)

    def fn(a, b):
        return pl.pallas_call(
            partial(_mxu_kernel, dtype, n_steps),
            out_shape=jax.ShapeDtypeStruct((128, 128), out_dt),
            grid=(n_steps,),
            in_specs=[blk_in, blk_in],
            out_specs=blk_out,
        )(a, b)

    return jax.jit(fn)


def timed(fn, args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    which = sys.argv[1:] or ["iadd", "imul", "fma", "shift", "mxu8", "mxuf"]
    rng = np.random.RandomState(0)
    S0, S1 = 32, 256
    for name in which:
        ts = {}
        for n in (S0, S1):
            if name.startswith("mxu"):
                dt = jnp.int8 if name == "mxu8" else jnp.float32
                fn = build_mxu(dt, n)
                if name == "mxu8":
                    a = jnp.asarray(rng.randint(-100, 100, (128, 128)), jnp.int8)
                    b = jnp.asarray(rng.randint(-100, 100, (128, 128)), jnp.int8)
                else:
                    a = jnp.asarray(rng.rand(128, 128), jnp.float32)
                    b = jnp.asarray(rng.rand(128, 128), jnp.float32)
                ts[n] = timed(fn, (a, b))
            else:
                fn, dt = build_vec(name, n)
                if dt == jnp.float32:
                    x = jnp.asarray(rng.rand(DEPTH, 8, 128), jnp.float32)
                else:
                    x = jnp.asarray(
                        rng.randint(0, 8191, (DEPTH, 8, 128)), jnp.int32
                    )
                ts[n] = timed(fn, (x,))
        slope = (ts[S1] - ts[S0]) / (S1 - S0)
        if name.startswith("mxu"):
            print(f"{name}: {slope*1e9:.1f}ns/matmul128 "
                  f"({128**3/max(slope,1e-12)/1e12:.2f} Tmac/s)", flush=True)
        else:
            per_op = slope / (DEPTH * INNER)
            print(f"{name}: {per_op*1e9:.2f}ns/tile-op "
                  f"({1/max(per_op,1e-12)/1e9:.2f}G tile-ops/s, "
                  f"{1024/max(per_op,1e-12)/1e12:.2f} Tlane-ops/s)", flush=True)


if __name__ == "__main__":
    main()
