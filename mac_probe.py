"""Raw MAC-rate probes: what does one multiply-accumulate cost on this chip?

The kernel roofline (PERF.md) prices everything in int32 vector ops; this
probe pins the actual retire rate of the candidate MAC engines so
optimization effort goes to the real bottleneck:

  imul   — int32 v = v*v + m chain (the current kernels' MAC)
  iadd   — int32 two-add dependency chain (carry-op cost unit)
  fma    — f32 v = v*v + m chain (candidate small-radix float layer)
  shift  — int32 v = ((v >> 13) & MASK) + m chain (carry decompose unit)
  mxu8   — 64 independent int8[128,128] matmuls per step
  mxuf   — same in f32

Measurement: one kernel, grid = (steps,), per-step body has DEPTH
independent chains x INNER dependent ops; the slope between a small and a
large step count cancels dispatch/relay fixed cost, and the windows are
sized in the tens of milliseconds so the axon relay's +-10 ms jitter
cannot drown them (min over reps).
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
INNER = 256    # dependent ops per chain per grid step
NMXU = 64      # independent matmuls per grid step
CREPS = 32     # dependent const-muls per grid step (cmul/cmulmx probes):
               # one VPU const-mul is ~86 ns/tile — far below the axon
               # relay's +-10 ms jitter at any step count, so the round-3
               # single-op-per-step windows measured noise (negative
               # slopes); chaining 32 through the acc feedback makes the
               # slope window tens of ms.


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
                v = v * v + m          # 1 mul + 1 add, dependent
            elif op == "iadd":
                v = v + m
                m = v + m              # 2 adds, dependent, unfoldable
            elif op == "fma":
                v = v * v + m
            elif op == "shift":
                v = ((v >> 13) & 0x1FFF) + m   # shift + and + add
        acc[d] = v

    @pl.when(t == n_steps - 1)
    def _():
        out_ref[...] = acc[...]


#: ops per chain-step for each probe (for the per-op normalization)
VEC_OPS = {"imul": 2, "iadd": 2, "fma": 2, "shift": 3}


# ---------------------------------------------------------------------------
# Montgomery-reduce const-mul: VPU schoolbook vs MXU int8 matmul prototype
# ---------------------------------------------------------------------------

from pairing_tpu.fields.fp import NLIMBS, P_LIMBS

WIDE = 2 * NLIMBS + 2
P_INT = [int(x) for x in P_LIMBS]


def _mxu_cmul_matrix() -> np.ndarray:
    """[4*WIDE, 48] int8 matrix: 4 split-groups of u[k] = sum_i m_i p_{k-i}.

    Data rows (48, padded from 42): x[(s*21)+i] = split s of limb i
    (m = m_lo + 2^7 m_hi, each half <= 127). Group (s, s') output row
    g*WIDE + k holds sum_i m^s_i * p^{s'}_{k-i}; the combine is
    u = Y00 + ((Y01 + Y10) << 7) + (Y11 << 14).
    """
    M = np.zeros((4 * WIDE, 48), np.int8)
    for g, (s, sp) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        for k in range(WIDE):
            for i in range(NLIMBS):
                j = k - i
                if 0 <= j < NLIMBS:
                    pj = (P_INT[j] >> (7 * sp)) & 0x7F
                    if pj:
                        M[g * WIDE + k, s * NLIMBS + i] = pj
    return M


def _cmul_kernel(n_steps, x_ref, out_ref, acc):
    """VPU baseline: u = m * p schoolbook (441 MACs) per step, m from acc."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[...] = x_ref[...]

    for _ in range(CREPS):
        m = [acc[i] for i in range(NLIMBS)]
        zero = m[0] * 0
        u = [None] * WIDE
        for i in range(NLIMBS):
            for j, pj in enumerate(P_INT):
                k = i + j
                term = m[i] * pj
                u[k] = term if u[k] is None else u[k] + term
        u = [x if x is not None else zero for x in u]
        # fold u back into acc so the work cannot be elided (mask keeps
        # the values in the settled range so the next rep's MACs stay
        # int32-safe; the feedback makes reps dependent)
        for i in range(NLIMBS):
            acc[i] = (u[i] + u[i + NLIMBS]) & 0x1FFF

    @pl.when(t == n_steps - 1)
    def _():
        out_ref[...] = acc[...]


def _cmulmx_kernel(n_steps, mat_ref, x_ref, out_ref, acc):
    """MXU prototype: same u = m * p via one int8 dot_general + combine."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[...] = x_ref[...]

    for _ in range(CREPS):
        m = acc[...]  # [NLIMBS, 8, 128] int32, values < 2^13
        x = jnp.concatenate([m & 0x7F, m >> 7], axis=0)  # [42, 8, 128]
        x = jnp.pad(x, ((0, 48 - 2 * NLIMBS), (0, 0), (0, 0))).astype(jnp.int8)
        y = jax.lax.dot_general(
            mat_ref[...], x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [4*WIDE, 8, 128]
        u = (
            y[:WIDE]
            + ((y[WIDE : 2 * WIDE] + y[2 * WIDE : 3 * WIDE]) << 7)
            + (y[3 * WIDE :] << 14)
        )
        for i in range(NLIMBS):
            acc[i] = (u[i] + u[i + NLIMBS]) & 0x1FFF

    @pl.when(t == n_steps - 1)
    def _():
        out_ref[...] = acc[...]


def build_cmul(name, n_steps):
    blk = pl.BlockSpec((NLIMBS, 8, 128), lambda t: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    if name == "cmul":
        def fn(x):
            return pl.pallas_call(
                partial(_cmul_kernel, n_steps),
                out_shape=jax.ShapeDtypeStruct((NLIMBS, 8, 128), jnp.int32),
                grid=(n_steps,),
                in_specs=[blk],
                out_specs=blk,
                scratch_shapes=[pltpu.VMEM((NLIMBS, 8, 128), jnp.int32)],
            )(x)

        return jax.jit(fn)

    mat = jnp.asarray(_mxu_cmul_matrix())
    mat_blk = pl.BlockSpec((4 * WIDE, 48), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)

    def fn(x):
        return pl.pallas_call(
            partial(_cmulmx_kernel, n_steps),
            out_shape=jax.ShapeDtypeStruct((NLIMBS, 8, 128), jnp.int32),
            grid=(n_steps,),
            in_specs=[mat_blk, blk],
            out_specs=blk,
            scratch_shapes=[pltpu.VMEM((NLIMBS, 8, 128), jnp.int32)],
        )(mat, x)

    return jax.jit(fn)


def _mxu_kernel(dtype, n_steps, a_ref, b_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    b = b_ref[...]
    pet = jnp.int32 if dtype == jnp.int8 else jnp.float32
    for d in range(NMXU):
        prod = jnp.dot(a_ref[d], b, preferred_element_type=pet)
        out_ref[d] = out_ref[d] + prod.astype(out_ref.dtype)


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
    out_dt = jnp.int32 if dtype == jnp.int8 else jnp.float32
    a_blk = pl.BlockSpec((NMXU, 128, 128), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    b_blk = pl.BlockSpec((128, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    o_blk = pl.BlockSpec((NMXU, 128, 128), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    def fn(a, b):
        return pl.pallas_call(
            partial(_mxu_kernel, dtype, n_steps),
            out_shape=jax.ShapeDtypeStruct((NMXU, 128, 128), out_dt),
            grid=(n_steps,),
            in_specs=[a_blk, b_blk],
            out_specs=o_blk,
        )(a, b)

    return jax.jit(fn)


def timed(fn, args, reps=8):
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
    which = sys.argv[1:] or [
        "iadd", "imul", "fma", "shift", "mxu8", "mxuf", "cmul", "cmulmx"
    ]
    rng = np.random.RandomState(0)
    for name in which:
        ts = {}
        if name.startswith("cmul"):
            S0, S1 = 512, 8192
            for n in (S0, S1):
                fn = build_cmul(name, n)
                x = jnp.asarray(
                    rng.randint(0, 8191, (NLIMBS, 8, 128)), jnp.int32)
                ts[n] = timed(fn, (x,))
                print(f"  {name} N={n}: {ts[n]*1e3:.2f}ms", flush=True)
            slope = (ts[S1] - ts[S0]) / (S1 - S0) / CREPS
            print(f"{name}: {slope*1e9:.1f}ns/const-mul (1024 lanes; "
                  f"VPU schoolbook = 441 MACs)", flush=True)
        elif name.startswith("mxu"):
            S0, S1 = 256, 16384
            dt = jnp.int8 if name == "mxu8" else jnp.float32
            for n in (S0, S1):
                fn = build_mxu(dt, n)
                if dt == jnp.int8:
                    a = jnp.asarray(
                        rng.randint(-100, 100, (NMXU, 128, 128)), jnp.int8)
                    b = jnp.asarray(rng.randint(-100, 100, (128, 128)), jnp.int8)
                else:
                    a = jnp.asarray(rng.rand(NMXU, 128, 128), jnp.float32)
                    b = jnp.asarray(rng.rand(128, 128), jnp.float32)
                ts[n] = timed(fn, (a, b))
                print(f"  {name} N={n}: {ts[n]*1e3:.2f}ms", flush=True)
            slope = (ts[S1] - ts[S0]) / (S1 - S0) / NMXU
            print(f"{name}: {slope*1e9:.1f}ns/matmul128 "
                  f"({128**3/max(slope,1e-12)/1e12:.2f} Tmac/s)", flush=True)
        else:
            S0, S1 = 256, 8192
            for n in (S0, S1):
                fn, dt = build_vec(name, n)
                if dt == jnp.float32:
                    x = jnp.asarray(rng.rand(DEPTH, 8, 128), jnp.float32)
                else:
                    x = jnp.asarray(
                        rng.randint(0, 8191, (DEPTH, 8, 128)), jnp.int32)
                ts[n] = timed(fn, (x,))
                print(f"  {name} N={n}: {ts[n]*1e3:.2f}ms", flush=True)
            ops = DEPTH * INNER * VEC_OPS[name]
            per_op = (ts[S1] - ts[S0]) / (S1 - S0) / ops
            print(f"{name}: {per_op*1e9:.3f}ns/tile-op "
                  f"({1/max(per_op,1e-12)/1e9:.2f}G tile-ops/s)", flush=True)


if __name__ == "__main__":
    main()
