"""Mesh construction and sharded pairing entry points.

TPU-native parallelism map (SURVEY.md §2.4, P1-P5):

  P1  lane batching     — every field op is already [batch, limbs] data
                          parallel; thousands of pairings per chip.
  P2  chip/host DP      — independent pairings sharded over the 'data'
                          mesh axis; zero steady-state communication.
  P3  multi-pairing     — pairs sharded over the 'pairs' axis; per-shard
                          partial Miller accumulators (squarings are
                          replicated, matching miller_loop_native.rs:239's
                          shared-squaring semantics exactly because line
                          factors commute into f multiplicatively), then a
                          multiplicative all-reduce and ONE final_exp.
  P4  cross-host        — same meshes with a leading 'dcn' axis; only the
                          final reduce + result gather crosses DCN.
  P5  comm backend      — XLA collectives (ppermute / all_gather) over
                          ICI; no external library.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.g1 import G1
from ..curves.g2 import G2
from ..fields.fp12 import Fq12
from ..pairing import api
from ..pairing.final_exp import final_exp
from ..pairing.miller_loop import multi_miller_loop
from .collectives import fq12_all_reduce_mul


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices (default: 1-D 'data')."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    dev_arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_arr, tuple(axis_names))


def _shard_leading(mesh: Mesh, axis: str, tree):
    """NamedSharding tree: shard the leading array axis over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pairing_data_parallel(mesh: Mesh, p: G1, q: G2, axis: str = "data") -> Fq12:
    """P2: independent pairings, batch axis sharded over the mesh.

    Pure data parallelism: XLA partitions every limb op; no collectives in
    the computation at all.
    """
    p = _shard_leading(mesh, axis, p)
    q = _shard_leading(mesh, axis, q)
    fn = jax.jit(
        api.pairing,
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(p, q)


def multi_pairing_sharded(
    mesh: Mesh, ps: G1, qs: G2, axis: str = "pairs"
) -> Fq12:
    """P3: product of K pairings, pairs axis sharded over the mesh.

    Each shard accumulates its local pairs' lines into a partial Fq12
    (starting from one, so partial products compose: the shared f^2 per
    iteration distributes over the product), then a multiplicative
    all-reduce over ICI combines shards and one final_exp finishes.
    """
    from jax import shard_map

    def local(ps_l, qs_l):
        f = multi_miller_loop(qs_l, ps_l)
        f = fq12_all_reduce_mul(f, axis)
        return f

    spec = P(axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(),  # replicated after the all-reduce
        check_vma=False,
    )
    f = jax.jit(fn)(ps, qs)
    return jax.jit(final_exp)(f)
