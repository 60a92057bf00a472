"""Per-kernel timing on the attached TPU (isolates kernels from glue)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pairing_tpu.fields.fp import NLIMBS
from pairing_tpu.ops.curve_kernels import trajectory_pallas
from pairing_tpu.ops.fused_kernels import (
    BN_X_LADDER_DIGITS,
    miller_f_pallas,
    pow_ladder_pallas,
)
from pairing_tpu.pairing.miller_loop import STEP_DIGITS


def sync(t):
    jax.block_until_ready(t)
    leaf = jax.tree.leaves(t)[0]
    return np.asarray(leaf.reshape(-1)[0])


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f}ms (compile {comp:.0f}s)", flush=True)


def main():
    R = 16  # 2048 lanes
    rng = np.random.RandomState(0)
    mk = lambda *shape: jnp.asarray(
        rng.randint(0, 1 << 13, size=shape).astype(np.int32)
    )

    tg = mk(64, 6, NLIMBS, R, 128)
    ch = mk(64, 6, NLIMBS, R, 128)
    flags = np.asarray([1 if d else 0 for d in STEP_DIGITS], np.int32)
    timeit(
        "miller_f kernel (64 steps)",
        jax.jit(lambda a, b: miller_f_pallas(a, b, flags, 1)),
        tg,
        ch,
    )

    q = mk(4, NLIMBS, R, 128)
    digs = np.asarray(STEP_DIGITS, np.int32)
    timeit(
        "trajectory kernel (64 steps)",
        jax.jit(lambda q: trajectory_pallas(q, digs)),
        q,
    )

    m = mk(12, NLIMBS, R, 128)
    timeit(
        "pow ladder kernel (62 steps)",
        jax.jit(lambda a, b: pow_ladder_pallas(a, b, BN_X_LADDER_DIGITS)),
        m,
        m,
    )


if __name__ == "__main__":
    main()
