"""Multi-host (DCN) execution substrate — P4 of SURVEY.md §2.4.

The reference is single-process (no distributed runtime at all); the
TPU-native scaling path is JAX's multi-controller model: one process per
host, `jax.distributed.initialize`, one global mesh whose leading axis
spans hosts (DCN) and trailing axis spans each host's chips (ICI). Only
the multi-pairing product reduce and the result gather cross DCN
(mesh.py P3); pure data-parallel batches (P2) never communicate.

Launch recipe (one command per host):

    python -m pairing_tpu.parallel.launch \
        --coordinator HOST0:1234 --num-processes 2 --process-id $I

or rely on TPU-pod metadata (GKE/gcloud set the env) and call
``init_distributed()`` with no arguments.

A CPU smoke mode (``--cpu-smoke``) runs the same code path with
multi-process CPU collectives (gloo), so the substrate is testable
without a TPU pod — tests/test_multihost.py does exactly that.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, defers to cloud-TPU metadata / env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) — the
    standard pod launch. Must run before any other JAX call.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(ici_axis: str = "data", dcn_axis: str = "dcn"):
    """Global mesh [hosts(DCN) x per-host-devices(ICI)].

    On one process this degenerates to a [1, n_devices] mesh — the same
    program runs unchanged from 1 chip to a multi-host pod.
    """
    import jax
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    if n_proc > 1 and jax.devices()[0].platform == "tpu":
        # real pod: let mesh_utils lay ICI-contiguous axes per slice
        from jax.experimental import mesh_utils

        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, n_local),
            dcn_mesh_shape=(n_proc, 1),
        )
    else:
        # CPU smoke / single process: group by owning process (the DCN
        # boundary IS the process boundary there)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        dev = np.asarray(devs).reshape(n_proc, n_local)
    return Mesh(dev, (dcn_axis, ici_axis))


def _smoke(args) -> None:
    """Tiny end-to-end multi-process drive: DP pairings over the global
    mesh + a cross-host multiplicative reduce; prints per-process report."""
    import jax

    if args.cpu_smoke:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: single-process CPU fallback still works
    init_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..curves import g1 as G1m
    from ..curves import g2 as G2m
    from ..fields import fp12 as F12
    from ..oracle import native as o
    from ..utils import bn254 as c
    from . import mesh as M

    mesh = make_hybrid_mesh()
    n_dev = mesh.devices.size
    per_dev = args.per_device_batch

    rng = np.random.RandomState(11)
    # same inputs on every process (global arrays must agree)
    scal = [int(rng.randint(1, 1 << 30)) for _ in range(n_dev * per_dev)]
    g1s = [o.g1_mul(c.G1_GEN, s) for s in scal]
    g2s = [o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), s + 1) for s in scal]
    p = G1m.g1_from_ints(g1s)
    q = G2m.g2_from_ints(g2s)

    spec = P(("dcn", "data"))
    with mesh:
        p = jax.tree.map(
            lambda x: jax.make_array_from_callback(
                x.shape,
                NamedSharding(mesh, spec),
                lambda idx, x=x: np.asarray(x[idx]),
            ),
            p,
        )
        q = jax.tree.map(
            lambda x: jax.make_array_from_callback(
                x.shape,
                NamedSharding(mesh, spec),
                lambda idx, x=x: np.asarray(x[idx]),
            ),
            q,
        )
        from ..pairing import api

        fn = jax.jit(api.pairing, out_shardings=NamedSharding(mesh, spec))
        e = fn(p, q)

        # validate the WHOLE sharded result against the oracle with an
        # in-graph equality (works under multi-process: the reduced
        # scalar is replicated and fetchable everywhere)
        expect_ints = [o.pairing(a, b) for a, b in zip(g1s, g2s)]
        expect = F12.fq12_from_int_coeffs(expect_ints)
        expect = jax.tree.map(
            lambda x: jax.make_array_from_callback(
                x.shape,
                NamedSharding(mesh, spec),
                lambda idx, x=x: np.asarray(x[idx]),
            ),
            expect,
        )
        eqv = jax.jit(lambda a, b: jnp.all(F12.fq12_eq(a, b)))(e, expect)
        assert bool(eqv), "sharded pairing mismatch vs oracle"
    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"mesh {mesh.devices.shape}, batch {n_dev * per_dev}: OK",
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--per-device-batch", type=int, default=1)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="run on multi-process CPU (gloo collectives)")
    args = ap.parse_args()
    _smoke(args)


if __name__ == "__main__":
    main()
