"""Streaming runner for very large pairing batches (BASELINE config 5).

Chunks a huge (e.g. 1M-pair) workload through the device(s), optionally
checkpointing each finished chunk to disk so a preempted run resumes where
it left off (SURVEY.md §5 checkpoint/resume obligation). Combined with
``parallel.mesh`` sharding this is the multi-host scaling path: each host
streams its shard of chunks; only multi-pairing reduces communicate.

Scale notes (round-2):
  * results stay device-side until one bulk int32 fetch per chunk
    (``fq12_to_canonical_limbs``) — no per-element Python bigints on the
    hot path; convert with ``fq12_limbs_to_int_coeffs`` only when actual
    integers are needed.
  * the final partial chunk is padded to ``chunk_size`` so the jitted
    pairing compiles exactly once per run.
  * checkpoints carry a digest of the chunk's inputs; resuming against
    different inputs raises instead of silently yielding stale values.
  * ``config.mesh_shape``/``mesh_axes`` shard each chunk's batch axis
    over a device mesh (P2 data parallelism).
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from ..curves.g1 import G1, g1_from_ints
from ..curves.g2 import G2, g2_from_ints
from ..fields import fp12 as F12
from ..pairing import api
from ..utils.config import PairingConfig


def _chunk_path(ckpt_dir: str, idx: int) -> str:
    return os.path.join(ckpt_dir, f"pairing_chunk_{idx:06d}.npz")


def _digest(g1_chunk, g2_chunk) -> str:
    h = hashlib.sha256()
    for pt in g1_chunk:
        h.update(repr(tuple(pt)).encode())
    for pt in g2_chunk:
        h.update(repr(tuple(pt)).encode())
    return h.hexdigest()


def pairing_stream(
    g1_points: Sequence[Tuple[int, int]],
    g2_points: Sequence,
    config: PairingConfig = PairingConfig(),
) -> Iterator[np.ndarray]:
    """Yield canonical Fq12 limb arrays chunk by chunk.

    Each yielded array has shape ``[chunk, 12, NLIMBS]`` (int32 canonical
    limbs; see ``fields.fp12.fq12_to_canonical_limbs``). With
    ``config.checkpoint_dir`` set, finished chunks are persisted and
    skipped on re-run (resume support); a resumed run validates that the
    checkpointed chunk was computed from the same inputs.
    """
    config.apply_backend()
    n = len(g1_points)
    assert len(g2_points) == n
    cs = config.chunk_size

    mesh = sharding = None
    if config.mesh_shape is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import make_mesh

        mesh = make_mesh(config.mesh_shape, config.mesh_axes)
        sharding = NamedSharding(mesh, P(config.mesh_axes[0]))

    def run(p, q):
        return F12.fq12_to_canonical_limbs(api.pairing(p, q))

    fn = jax.jit(run, out_shardings=sharding)

    if config.checkpoint_dir:
        os.makedirs(config.checkpoint_dir, exist_ok=True)

    for idx, start in enumerate(range(0, n, cs)):
        g1_chunk = list(g1_points[start : start + cs])
        g2_chunk = list(g2_points[start : start + cs])
        m = len(g1_chunk)
        if config.checkpoint_dir:
            path = _chunk_path(config.checkpoint_dir, idx)
            if os.path.exists(path):
                with np.load(path) as z:
                    if str(z["digest"]) != _digest(g1_chunk, g2_chunk):
                        raise ValueError(
                            f"checkpoint {path} was computed from different "
                            "inputs; refusing to resume"
                        )
                    yield z["limbs"]
                continue
        # Pad the tail chunk so the jitted shape is constant (one compile).
        if m < cs:
            g1_pad = g1_chunk + [g1_chunk[-1]] * (cs - m)
            g2_pad = g2_chunk + [g2_chunk[-1]] * (cs - m)
        else:
            g1_pad, g2_pad = g1_chunk, g2_chunk
        p = g1_from_ints(g1_pad)
        q = g2_from_ints(g2_pad)
        if sharding is not None:
            p = jax.tree.map(lambda x: jax.device_put(x, sharding), p)
            q = jax.tree.map(lambda x: jax.device_put(x, sharding), q)
        limbs = np.asarray(fn(p, q))[:m]
        if config.checkpoint_dir:
            np.savez(
                _chunk_path(config.checkpoint_dir, idx),
                limbs=limbs,
                digest=np.str_(_digest(g1_chunk, g2_chunk)),
            )
        yield limbs
