"""Per-grid-step cost probes for the fused kernels (round-2 diagnosis).

Measures marginal cost per grid step by comparing N=8 vs N=64 step
variants of stripped-down kernels (slope cancels relay/dispatch fixed
costs):

  noop   — per-step streamed line block, body = 1 tile add
  mul    — + one dense Fq12 _mul_core (fori term loop, dynamic gathers)
  when0  — + pl.when(flag==1) sparse mul, flags ALL ZERO
  when1  — same, flags ALL ONE
  cyc    — Granger-Scott cyclotomic square only

Interpretation:
  * noop slope >> 0        -> grid pipeline overhead dominates
  * when0 ~= when1 slope   -> pl.when pays both arms
  * mul slope vs isolated dense-mul time -> fori/gather efficiency
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

from pairing_tpu.fields.fp import NLIMBS
from pairing_tpu.ops import kernel_core as K
from pairing_tpu.ops.fq12_kernels import _mul_core, _seg_tables, _VocabRef
from pairing_tpu.ops.fused_kernels import DENSE, S034, _copy_f, _ref_get, _ref_out

R = 16  # 2048 lanes


def _stream_spec():
    return pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128), lambda bt, t: (t, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )


def _out_spec():
    return pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )


def _noop_kernel(n_steps, s_ref, out_ref, fA):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = s_ref[0, c % 6, l]

    fA[0, 0] = fA[0, 0] + s_ref[0, 0, 0]

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def _mul_kernel(n_steps, with_when, dl_ref, dr_ref, sl_ref, sr_ref, flag_ref,
                s_ref, out_ref, fA, fB, vocab, rvocab):
    t = pl.program_id(1)
    zero = s_ref[0, 0, 0] * 0

    @pl.when(t == 0)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = s_ref[0, c % 6, l]

    _mul_core(DENSE, dl_ref, dr_ref, _ref_get(fA),
              lambda jj, cc, l: s_ref[0, (2 * jj + cc) % 6, l],
              _ref_out(fB), _VocabRef(vocab), _VocabRef(rvocab), zero)

    if with_when:
        flag = flag_ref[t]

        @pl.when(flag == 1)
        def _():
            _mul_core(S034, sl_ref, sr_ref, _ref_get(fB),
                      lambda jj, cc, l: s_ref[0, (2 * jj + cc) % 6, l],
                      _ref_out(fA), _VocabRef(vocab), _VocabRef(rvocab), zero)

        @pl.when(flag == 0)
        def _():
            _copy_f(fA, fB)
    else:
        _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def _cyc_kernel(n_steps, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = s_ref[0, c % 6, l]

    slots_in = [
        (
            [fA[2 * i, l] for l in range(NLIMBS)],
            [fA[2 * i + 1, l] for l in range(NLIMBS)],
        )
        for i in range(6)
    ]
    sq = K.k_cyc_sq(slots_in)
    for i in range(6):
        for l in range(NLIMBS):
            fA[2 * i, l] = sq[i][0][l]
            fA[2 * i + 1, l] = sq[i][1][l]

    @pl.when(t == n_steps - 1)
    def _():
        for c in range(12):
            for l in range(NLIMBS):
                out_ref[c, l] = fA[c, l]


def build(kind, n_steps, flags_val=0):
    dl, dr, _ = _seg_tables(DENSE)
    sl, sr, _ = _seg_tables(S034)
    flags = np.full((n_steps,), flags_val, np.int32)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    scr12 = lambda: pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32)

    if kind == "noop":
        kern, in_specs, consts, scratch = (
            partial(_noop_kernel, n_steps), [_stream_spec()], (), [scr12()])
    elif kind in ("mul", "when"):
        kern = partial(_mul_kernel, n_steps, kind == "when")
        in_specs = [smem()] * 5 + [_stream_spec()]
        consts = (jnp.asarray(dl), jnp.asarray(dr), jnp.asarray(sl),
                  jnp.asarray(sr), jnp.asarray(flags))
        scratch = [scr12(), scr12(),
                   pltpu.VMEM((24, NLIMBS, 8, 128), jnp.int32),
                   pltpu.VMEM((18, NLIMBS, 8, 128), jnp.int32)]
    elif kind == "cyc":
        kern, in_specs, consts, scratch = (
            partial(_cyc_kernel, n_steps), [_stream_spec()], (),
            [scr12(), scr12()])

    def fn(stream):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((12, NLIMBS, R, 128), jnp.int32),
            grid=(R // 8, n_steps),
            in_specs=in_specs,
            out_specs=_out_spec(),
            scratch_shapes=scratch,
        )(*consts, stream)

    return jax.jit(fn)


def timed(fn, stream, reps=6):
    out = fn(stream)
    jax.block_until_ready(out)
    np.asarray(out[0, 0, 0, 0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(stream)
        jax.block_until_ready(out)
        np.asarray(out[0, 0, 0, 0])
        best = min(best, time.time() - t0)
    return best


def main():
    which = sys.argv[1:] or ["noop", "mul", "when0", "when1", "cyc"]
    rng = np.random.RandomState(0)
    results = {}
    for name in which:
        kind, fv = (name[:-1], int(name[-1])) if name.startswith("when") else (name, 0)
        ts = {}
        for n in (8, 64):
            stream = jnp.asarray(
                rng.randint(0, 1 << 13, size=(n, 6, NLIMBS, R, 128)).astype(np.int32))
            t0 = time.time()
            fn = build(kind, n, fv)
            t = timed(fn, stream)
            ts[n] = t
            print(f"{name} N={n}: {t*1e3:.2f}ms (build+compile {time.time()-t0:.0f}s)",
                  flush=True)
        slope = (ts[64] - ts[8]) / 56
        results[name] = slope
        print(f"{name}: slope {slope*1e6:.0f}us/step (grid bt=2)", flush=True)
    print({k: f"{v*1e6:.0f}us" for k, v in results.items()})


if __name__ == "__main__":
    main()
