"""Streamed witness generation for batches beyond trace HBM residency.

A full pairing witness trace costs ~0.6 GB per 2048 lanes (f_steps +
three 64-row exp ladders + trajectory/lines/aux), so a 16384-lane trace
(~5 GB) plus working set approaches the chip's HBM. Instead of capping
the batch (the round-4 workaround: ``bench.py`` clamps pipeline depth),
this module runs a large workload in fixed-size chunks and overlaps each
chunk's device->host trace copy-out with the NEXT chunk's compute:

  * JAX dispatch is asynchronous — ``fn(chunk[i+1])`` enqueues the next
    chunk's kernels and returns immediately;
  * the subsequent ``jax.device_get(trace[i])`` blocks only until chunk
    *i*'s kernels retire, then copies while chunk *i+1* executes.

Peak device residency is therefore two chunk traces (compute + drain),
independent of the total workload size, and the host sees a continuous
stream of ``(out, trace)`` numpy chunks.

Reference analogue: the circuit side fills witness wires for the whole
circuit at once (pairing.rs:77-78 ``set_witness``); at TPU batch sizes
that materialization has to be tiled, which is a deployment concern the
reference never hits (single-proof scale).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import numpy as np

from ..curves.g1 import G1
from ..curves.g2 import G2


def _slice_tree(tree, lo: int, hi: int):
    return jax.tree.map(lambda a: a[lo:hi], tree)


def make_stream_fn(collect=None):
    """Build the jitted per-chunk function once (reuse across streams)."""
    from .trace import pairing_witness

    if collect is None:
        collect = lambda out, trace: (out, trace)

    def run(pc, qc):
        out, trace = pairing_witness(pc, qc)
        return collect(out, trace)

    return jax.jit(run)


def witness_stream(
    p: G1,
    q: G2,
    chunk_size: int,
    collect=None,
    fn=None,
) -> Iterator[Tuple[int, object, object]]:
    """Yield ``(start, out_host, trace_host)`` per chunk of a big batch.

    ``p``/``q`` carry a flat leading batch axis (host or device arrays);
    the batch must divide evenly into ``chunk_size`` chunks (pad the tail
    like ``parallel.runner.pairing_stream`` if it does not — witness
    consumers index lanes explicitly, so padding is caller policy).

    ``collect(out, trace) -> (out_like, trace_like)`` selects what is
    streamed to host (default: everything); it must return a 2-tuple.
    The yielded pytrees are numpy (host) arrays. Pass a prebuilt
    ``fn`` (from :func:`make_stream_fn`) to reuse its jit cache across
    repeated streams; ``collect`` is ignored when ``fn`` is given.
    """
    n = jax.tree.leaves(p)[0].shape[0]
    assert n % chunk_size == 0, (
        f"batch {n} not divisible by chunk_size {chunk_size}; pad the tail"
    )
    if fn is None:
        fn = make_stream_fn(collect)

    pending = []  # [(start, device_result)] — at most 1 entry
    for start in range(0, n, chunk_size):
        res = fn(_slice_tree(p, start, start + chunk_size),
                 _slice_tree(q, start, start + chunk_size))
        if pending:
            s0, r0 = pending.pop()
            yield (s0, *jax.device_get(r0))
        pending.append((start, res))
    s0, r0 = pending.pop()
    yield (s0, *jax.device_get(r0))
