"""Benchmark: batched BN254 ate pairings/s on the available accelerator.

Prints ONE JSON line:
  {"metric": "pairings_per_sec_per_chip", "value": N, "unit": "pairings/s",
   "vs_baseline": N}

Baseline normalization: the north-star target is >=100k pairings/s on a
v5p-16 (8 chips) => 12,500 pairings/s/chip (BASELINE.md). The reference
itself publishes no numbers (BASELINE.json "published": {}).

Run on TPU (default harness env) or CPU (JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time

BASELINE_PER_CHIP = 100_000 / 8  # north-star v5p-16 target, per chip


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--validate", type=int, default=-1,
                    help="lanes to check vs the oracle (-1 = every unique lane)")
    ap.add_argument("--unique", type=int, default=256,
                    help="distinct input pairs (tiled to fill the batch)")
    ap.add_argument("--multi", type=int, default=0,
                    help="K>0: benchmark the Groth16 shape (BASELINE "
                    "config 2) — batches of K-pair products, each with "
                    "shared squarings and ONE final exp; throughput is "
                    "counted in pairings (K per product)")
    ap.add_argument("--witness", action="store_true",
                    help="benchmark batched witness generation (BASELINE "
                    "config 4): full pairing + per-step f trace + exp "
                    "ladder rows; metric = witnesses/s")
    ap.add_argument("--stream", type=int, default=0,
                    help="with --witness: stream the batch through the "
                    "chunked runner (witness.stream) in chunks of this "
                    "size, fetching every chunk's trace to host overlapped "
                    "with the next chunk's compute; metric = sustained "
                    "witnesses/s INCLUDING host copy-out (the depth cap "
                    "does not apply — residency is 2 chunks)")
    ap.add_argument("--profile", type=str, default=None,
                    help="capture a jax.profiler trace into this directory")
    ap.add_argument("--pipeline", type=int, default=4,
                    help="dispatch depth for the throughput measurement: "
                    "N batches are enqueued back-to-back and synced once, "
                    "overlapping host/relay dispatch latency with device "
                    "compute (production serving shape). 1 = per-batch "
                    "sync (latency mode).")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from pairing_tpu.curves import g1 as G1m
    from pairing_tpu.curves import g2 as G2m
    from pairing_tpu.fields import fp12 as F12
    from pairing_tpu.oracle import native as o
    from pairing_tpu.pairing import api
    from pairing_tpu.utils import bn254 as c

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    assert not (args.multi and args.witness), "--multi and --witness are exclusive"
    if args.witness:
        # the full trace is ~0.6 GB / 2048 lanes; pipelined batches are
        # all live on the chip at once, so cap the dispatch depth to keep
        # total trace residency around one 8192-lane batch (v5e: 16 GB)
        args.pipeline = min(args.pipeline, max(1, 8192 // args.batch))
    K = max(0, args.multi)
    n_points = args.batch * max(1, K)
    rng = random.Random(7)
    n_unique = min(n_points, args.unique)
    g1s = [o.g1_mul(c.G1_GEN, rng.randrange(1, c.R_SCALAR)) for _ in range(n_unique)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), rng.randrange(1, c.R_SCALAR))
        for _ in range(n_unique)
    ]
    reps = -(-n_points // n_unique)
    g1s = (g1s * reps)[:n_points]
    g2s = (g2s * reps)[:n_points]

    if K:
        # [K, batch] pair layout: instance b holds points K*b .. K*b+K-1
        p = G1m.g1_from_ints(g1s)
        q = G2m.g2_from_ints(g2s)
        import jax.numpy as _jnp

        resh = lambda a: _jnp.moveaxis(
            a.reshape((args.batch, K) + a.shape[1:]), 0, 1
        )
        p = jax.tree.map(resh, p)
        q = jax.tree.map(resh, q)
        fn = jax.jit(api.multi_pairing)
    elif args.witness:
        from pairing_tpu.witness import trace as W

        p = G1m.g1_from_ints(g1s)
        q = G2m.g2_from_ints(g2s)

        if args.stream:
            from pairing_tpu.witness.stream import make_stream_fn, witness_stream

            assert args.batch % args.stream == 0, "--stream must divide --batch"
            sfn = make_stream_fn(
                lambda out, tr: (
                    out,
                    (tr["miller"]["f_steps"],
                     tr["final_exp"]["exp_trace_rows"]),
                )
            )

            def fn(p, q):
                # one full streamed pass: every chunk's trace lands on the
                # host (numpy), copy-out overlapped with the next chunk
                outs, traces = [], None
                for _start, out_h, tr_h in witness_stream(
                    p, q, args.stream, fn=sfn
                ):
                    outs.append(out_h)
                    traces = tr_h
                import numpy as _np

                out_all = jax.tree.map(
                    lambda *xs: _np.concatenate(xs, axis=0), *outs
                )
                return out_all, traces[0], traces[1]

        else:

            def witness_fn(p, q):
                out, tr = W.pairing_witness(p, q)
                return out, tr["miller"]["f_steps"], tr["final_exp"]["exp_trace_rows"]

            fn = jax.jit(witness_fn)
    else:
        p = G1m.g1_from_ints(g1s)
        q = G2m.g2_from_ints(g2s)
        fn = jax.jit(api.pairing)

    def sync(res):
        # force full device completion: fetch one device-sliced scalar to
        # host (the axon relay's block_until_ready can return before
        # remote execution finishes, so a host fetch is the reliable
        # barrier; slicing on device keeps the fetch tiny)
        jax.block_until_ready(res)
        return np.asarray(jax.tree.leaves(res)[0].reshape(-1)[0])

    import numpy as np

    t0 = time.time()
    out = fn(p, q)
    sync(out)
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = fn(p, q)
        sync(out)
        times.append(time.time() - t0)

    # Sustained throughput: enqueue `pipeline` batches back-to-back and
    # sync once — device compute overlaps the per-dispatch host/relay
    # latency (the serving steady state; each batch still runs alone on
    # the chip, so this measures real device throughput, not overlap
    # between batches).
    depth = max(1, args.pipeline)
    pipe_times = []
    for _ in range(args.iters):
        t0 = time.time()
        outs = [fn(p, q) for _ in range(depth)]
        for o_ in outs:
            sync(o_)
        pipe_times.append((time.time() - t0) / depth)

    if args.profile:
        with jax.profiler.trace(args.profile):
            sync(fn(p, q))
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)
    best = min(pipe_times)
    pairings_per_sec = n_points / best
    if K:
        print(
            f"# multi K={K}: {args.batch} products/batch, "
            f"{n_points} pairings/batch",
            file=sys.stderr,
        )
    print(f"# per-batch latency: {[f'{t:.3f}' for t in times]}",
          file=sys.stderr)
    print(f"# pipelined (depth {depth}): {[f'{t:.3f}' for t in pipe_times]}",
          file=sys.stderr)

    if args.witness:
        out, f_steps, exp_rows = out
    if args.validate != 0 and K:
        # each product instance i consumes points K*i .. K*i+K-1; check
        # the instances covering every unique point at least once
        nv = (
            -(-n_unique // K)
            if args.validate < 0
            else min(args.validate, args.batch)
        )
        got = F12.fq12_to_int_coeffs(out)
        for i in range(nv):
            pairs = [(g1s[K * i + j], g2s[K * i + j]) for j in range(K)]
            expect = o.final_exp(o.multi_miller_loop(pairs))
            assert got[i] == expect, f"instance {i} mismatch vs oracle"
        print(
            f"# validated {nv} K={K} product instances vs oracle",
            file=sys.stderr,
        )
    elif args.validate != 0:
        # every unique input appears in the first n_unique lanes; checking
        # them all (plus the tiled copies' bit-identity) covers the batch
        nv = n_unique if args.validate < 0 else min(args.validate, args.batch)
        got = F12.fq12_to_int_coeffs(out)
        for i in range(nv):
            expect = o.pairing(g1s[i], g2s[i])
            assert got[i] == expect, f"lane {i} mismatch vs oracle"
        for i in range(nv, args.batch):
            assert got[i] == got[i % n_unique], f"tiled lane {i} mismatch"
        print(f"# validated {nv} unique lanes (+{args.batch-nv} tiled) vs oracle",
              file=sys.stderr)

    metric = "witnesses_per_sec_per_chip" if args.witness else "pairings_per_sec_per_chip"
    unit = "witnesses/s" if args.witness else "pairings/s"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pairings_per_sec, 2),
                "unit": unit,
                "vs_baseline": round(pairings_per_sec / BASELINE_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
