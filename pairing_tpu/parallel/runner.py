"""Streaming runner for very large pairing batches (BASELINE config 5).

Chunks a huge (e.g. 1M-pair) workload through the device(s), optionally
checkpointing each finished chunk to disk so a preempted run resumes where
it left off (SURVEY.md §5 checkpoint/resume obligation). Combined with
``parallel.mesh`` sharding this is the multi-host scaling path: each host
streams its shard of chunks; only multi-pairing reduces communicate.
"""

from __future__ import annotations

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
    return os.path.join(ckpt_dir, f"pairing_chunk_{idx:06d}.npy")


def pairing_stream(
    g1_points: Sequence[Tuple[int, int]],
    g2_points: Sequence,
    config: PairingConfig = PairingConfig(),
) -> Iterator[np.ndarray]:
    """Yield canonical Fq12 coefficient arrays chunk by chunk.

    Each yielded array has shape [chunk, 12] (object dtype ints). With
    ``config.checkpoint_dir`` set, finished chunks are persisted and
    skipped on re-run (resume support).
    """
    config.apply_backend()
    n = len(g1_points)
    assert len(g2_points) == n
    cs = config.chunk_size
    fn = jax.jit(api.pairing)

    if config.checkpoint_dir:
        os.makedirs(config.checkpoint_dir, exist_ok=True)

    for idx, start in enumerate(range(0, n, cs)):
        if config.checkpoint_dir:
            path = _chunk_path(config.checkpoint_dir, idx)
            if os.path.exists(path):
                yield np.load(path, allow_pickle=True)
                continue
        p = g1_from_ints(list(g1_points[start : start + cs]))
        q = g2_from_ints(list(g2_points[start : start + cs]))
        e = fn(p, q)
        coeffs = np.asarray(F12.fq12_to_int_coeffs(e), dtype=object)
        if config.checkpoint_dir:
            np.save(_chunk_path(config.checkpoint_dir, idx), coeffs)
        yield coeffs
