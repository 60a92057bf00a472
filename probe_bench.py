"""Per-grid-step cost probes for the fused kernels (v2 cores).

Measures the marginal device cost of one in-kernel op by comparing N=8 vs
N=64 step variants of stripped-down kernels (the slope cancels the fixed
relay/dispatch cost that poisons single-shot measurements):

  noop   — per-step streamed line block, body = 1 tile add
  mul    — + one dense Fq12 _mul_core_v2 (63 wide muls, Karatsuba)
  sq     — dense Fq12 square _sq_core_v2 (42 wide muls)
  sparse — 034 sparse product _sparse_core_v2 (54 wide muls)
  when0  — pl.when(flag==1)-gated sparse mul, flags ALL ZERO
  when1  — same, flags ALL ONE
  cyc    — Granger-Scott cyclotomic square (k_cyc_sq, 12 reduces)

Interpretation:
  * noop slope >> 0        -> grid pipeline overhead dominates
  * when0 ~= when1 slope   -> pl.when pays both arms (it should not)
  * per-op slopes are the roofline numerators: PERF.md divides them by
    the exact wide-mul/MAC counts from ops/kwide to get SoL utilization.

Usage: python probe_bench.py [probe ...]   (default: all)
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
from pairing_tpu.ops.fq12_kernels import (
    _mul_core_v2,
    _mul_core_v3,
    _sparse_core_v2,
    _sq_core_v2,
    _sq_core_v3,
)
from pairing_tpu.ops.fused_kernels import S034, _copy_f, _ref_get, _ref_out

R = 16  # 2048 lanes


def _stream_spec():
    # wraps mod 8 so a long step axis still streams a fresh block per step
    # without a multi-hundred-MB host array
    return pl.BlockSpec(
        (1, 6, NLIMBS, 8, 128), lambda bt, t: (t % 8, 0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )


def _out_spec():
    return pl.BlockSpec(
        (12, NLIMBS, 8, 128), lambda bt, t: (0, 0, bt, 0),
        memory_space=pltpu.VMEM,
    )


def _seed_f(fA, s_ref):
    for c in range(12):
        for l in range(NLIMBS):
            fA[c, l] = s_ref[0, c % 6, l]


def _emit(out_ref, fA):
    for c in range(12):
        for l in range(NLIMBS):
            out_ref[c, l] = fA[c, l]


def _noop_kernel(n_steps, s_ref, out_ref, fA):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    fA[0, 0] = fA[0, 0] + s_ref[0, 0, 0]

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _stream_b_get(s_ref):
    return lambda c, l: s_ref[0, c % 6, l]


def _mul_kernel(n_steps, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    _mul_core_v2(_ref_get(fA), _stream_b_get(s_ref), _ref_out(fB))
    _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _sq_kernel(n_steps, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    _sq_core_v2(_ref_get(fA), _ref_out(fB))
    _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _mul3_kernel(n_steps, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    _mul_core_v3(_ref_get(fA), _stream_b_get(s_ref), _ref_out(fB))
    _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _sq3_kernel(n_steps, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    _sq_core_v3(_ref_get(fA), _ref_out(fB))
    _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _sparse_kernel(n_steps, with_when, flag_ref, s_ref, out_ref, fA, fB):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    def run(dst):
        _sparse_core_v2(
            S034, _ref_get(fA),
            lambda jj, cc, l: s_ref[0, (2 * jj + cc) % 6, l],
            _ref_out(dst),
        )

    if with_when:
        flag = flag_ref[t]

        @pl.when(flag == 1)
        def _():
            run(fB)
            _copy_f(fA, fB)
    else:
        run(fB)
        _copy_f(fA, fB)

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _cyc_kernel(n_steps, s_ref, out_ref, fA):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

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
        _emit(out_ref, fA)


def _bw_kernel(n_steps, mode, s_ref, out_ref, fA, fB):
    """VMEM traffic probe: per step move 12x21 tiles through the scratch
    register file with minimal ALU work.

      copy — fB[c,l] = fA[c,l] + 1 (252 loads + 252 stores, 252 adds)
      red  — acc += fA[c,l]        (252 loads, 1 store, 252 adds)

    Against the ALU probes this prices a VMEM load/store: if the copy
    slope is ~252 * the add-chain per-op cost, loads/stores are ~free
    (register-file bandwidth matches ALU); if it is much higher, the
    cores' residual over the ALU model is memory movement."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        _seed_f(fA, s_ref)

    if mode == "copy":
        for c in range(12):
            for l in range(NLIMBS):
                fB[c, l] = fA[c, l] + 1
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = fB[c, l] + 1
    else:  # red
        acc = fA[0, 0]
        for c in range(12):
            for l in range(NLIMBS):
                acc = acc + fA[c, l]
        fA[0, 0] = acc

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def _dyn_kernel(n_steps, dynamic, idx_ref, s_ref, out_ref, fA, tab):
    """Copy 12x21 tiles from a 4-row table per step, dynamic vs static
    leading index — isolates the cost of dynamic VMEM indexing (the VM
    register file and the ladder table-select both lean on it)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for r in range(4):
            for c in range(12):
                for l in range(NLIMBS):
                    tab[r, c, l] = s_ref[0, c % 6, l] + r

    if dynamic:
        idx = idx_ref[t]
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = fA[c, l] + tab[idx, c, l]
    else:
        for c in range(12):
            for l in range(NLIMBS):
                fA[c, l] = fA[c, l] + tab[0, c, l]

    @pl.when(t == n_steps - 1)
    def _():
        _emit(out_ref, fA)


def run_ladder_probe(all_ones: bool, N0=8, N1=128):
    """Slope of the REAL w4 pow ladder kernel per step: digits all-zero
    (cyc-square path) vs all-one (cyc + table-select + dense mul)."""
    from pairing_tpu.ops.fused_kernels import pow_ladder_w4_pallas
    rng = np.random.RandomState(0)
    m = jnp.asarray(
        rng.randint(0, 1 << 13, size=(12, NLIMBS, R, 128)).astype(np.int32))
    ts = {}
    for n in (N0, N1):
        digs = np.ones((n,), np.int32) if all_ones else np.asarray(
            [1] + [0] * (n - 1), np.int32)
        fn = jax.jit(lambda m, d=digs: pow_ladder_w4_pallas(m, d))
        t0 = time.time()
        t = timed(fn, m)
        ts[n] = t
        print(f"  ladder{'1' if all_ones else '0'} N={n}: {t*1e3:.2f}ms "
              f"(build+compile {time.time()-t0:.0f}s)", flush=True)
    return (ts[N1] - ts[N0]) / (N1 - N0)


def build(kind, n_steps, flags_val=0):
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    scr12 = lambda: pltpu.VMEM((12, NLIMBS, 8, 128), jnp.int32)
    consts = ()
    if kind == "noop":
        kern, in_specs, scratch = (
            partial(_noop_kernel, n_steps), [_stream_spec()], [scr12()])
    elif kind == "mul":
        kern, in_specs, scratch = (
            partial(_mul_kernel, n_steps), [_stream_spec()],
            [scr12(), scr12()])
    elif kind == "sq":
        kern, in_specs, scratch = (
            partial(_sq_kernel, n_steps), [_stream_spec()],
            [scr12(), scr12()])
    elif kind == "mul3":
        kern, in_specs, scratch = (
            partial(_mul3_kernel, n_steps), [_stream_spec()],
            [scr12(), scr12()])
    elif kind == "sq3":
        kern, in_specs, scratch = (
            partial(_sq3_kernel, n_steps), [_stream_spec()],
            [scr12(), scr12()])
    elif kind in ("sparse", "when"):
        kern = partial(_sparse_kernel, n_steps, kind == "when")
        in_specs = [smem(), _stream_spec()]
        consts = (jnp.asarray(np.full((n_steps,), flags_val, np.int32)),)
        scratch = [scr12(), scr12()]
    elif kind == "cyc":
        kern, in_specs, scratch = (
            partial(_cyc_kernel, n_steps), [_stream_spec()], [scr12()])
    elif kind in ("bwcopy", "bwred"):
        kern = partial(_bw_kernel, n_steps, kind[2:])
        in_specs = [_stream_spec()]
        scratch = [scr12(), scr12()]
    elif kind in ("dyn", "stat"):
        kern = partial(_dyn_kernel, n_steps, kind == "dyn")
        in_specs = [smem(), _stream_spec()]
        consts = (jnp.asarray(
            np.arange(n_steps, dtype=np.int32) % 4),)
        scratch = [scr12(), pltpu.VMEM((4, 12, NLIMBS, 8, 128), jnp.int32)]
    else:
        raise SystemExit(f"unknown probe {kind}")

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


def timed(fn, stream, reps=10):
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


ALL = ["noop", "mul", "mul3", "sq", "sq3", "sparse", "when0", "when1",
       "cyc", "dyn", "stat", "bwcopy", "bwred", "ladder0", "ladder1"]


def main():
    which = sys.argv[1:] or ALL
    rng = np.random.RandomState(0)
    results = {}
    for name in [w for w in which if w.startswith("ladder")]:
        slope = run_ladder_probe(name == "ladder1")
        results[name] = slope
        print(f"{name}: slope {slope*1e6:.1f}us/step (2048 lanes)", flush=True)
    which = [w for w in which if not w.startswith("ladder")]
    # Wide step contrast: the axon relay adds ~±10 ms of per-call jitter,
    # so the slope window must dwarf it (504 steps x ~50 us >> jitter).
    N0, N1 = 8, 512
    for name in which:
        kind, fv = (
            (name[:-1], int(name[-1])) if name.startswith("when") else (name, 0)
        )
        ts = {}
        for n in (N0, N1):
            stream = jnp.asarray(
                rng.randint(0, 1 << 13, size=(8, 6, NLIMBS, R, 128)).astype(
                    np.int32
                )
            )
            t0 = time.time()
            fn = build(kind, n, fv)
            t = timed(fn, stream)
            ts[n] = t
            print(
                f"{name} N={n}: {t*1e3:.2f}ms (build+compile {time.time()-t0:.0f}s)",
                flush=True,
            )
        slope = (ts[N1] - ts[N0]) / (N1 - N0)
        results[name] = slope
        print(f"{name}: slope {slope*1e6:.1f}us/step (2048 lanes)", flush=True)
    print({k: f"{v*1e6:.1f}us" for k, v in results.items()})


if __name__ == "__main__":
    main()
