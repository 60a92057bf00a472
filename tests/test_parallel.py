"""Sharding / collective tests on the virtual 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pairing_tpu.fields import fp12 as F12
from pairing_tpu.oracle import native as o
from pairing_tpu.parallel import mesh as M
from pairing_tpu.parallel.collectives import (
    fq12_all_reduce_mul,
    fq12_reduce_mul_psum_style,
)
from pairing_tpu.utils.bn254 import P as MOD

RNG = random.Random(555)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("reduce_fn", [fq12_all_reduce_mul, fq12_reduce_mul_psum_style])
def test_fq12_all_reduce_mul(reduce_fn):
    from jax import shard_map

    n = 8
    mesh = M.make_mesh((n,), ("x",))
    vals = [[RNG.randrange(MOD) for _ in range(12)] for _ in range(n)]
    a = F12.fq12_from_int_coeffs(vals)  # batch [8], one element per shard

    def local(f):
        # f has local batch 1; reduce over shards multiplicatively
        return reduce_fn(f, "x")

    fn = shard_map(
        local, mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False
    )
    out = jax.jit(fn)(a)
    got = F12.fq12_to_int_coeffs(out)
    expect = vals[0]
    for v in vals[1:]:
        expect = o.fq12_mul(expect, v)
    # every shard holds the same reduced value
    for row in got:
        assert row == expect


@pytest.mark.parametrize("n", [3, 6])
def test_fq12_all_reduce_mul_non_pow2_axis(n):
    """VERDICT r3 item 7: non-power-of-two axes auto-route to all-gather."""
    from jax import shard_map

    mesh = M.make_mesh((n,), ("x",), devices=jax.devices()[:n])
    vals = [[RNG.randrange(MOD) for _ in range(12)] for _ in range(n)]
    a = F12.fq12_from_int_coeffs(vals)

    fn = shard_map(
        lambda f: fq12_all_reduce_mul(f, "x"),
        mesh=mesh,
        in_specs=(P("x"),),
        out_specs=P("x"),
        check_vma=False,
    )
    got = F12.fq12_to_int_coeffs(jax.jit(fn)(a))
    expect = vals[0]
    for v in vals[1:]:
        expect = o.fq12_mul(expect, v)
    for row in got:
        assert row == expect


@pytest.mark.parametrize("n", [3])
def test_multi_pairing_sharded_non_pow2_mesh(n):
    """multi_pairing_sharded end-to-end on a non-pow2 mesh (dryrun-style).

    Only n=3 compiles the full pairing graph here (CPU compile of this
    graph is minutes); the 6-device case is covered at the collective
    level by test_fq12_all_reduce_mul_non_pow2_axis."""
    from pairing_tpu.curves import g1 as G1m
    from pairing_tpu.curves import g2 as G2m
    from pairing_tpu.utils import bn254 as c

    mesh = M.make_mesh((n,), ("pairs",), devices=jax.devices()[:n])
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(n)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(n)
    ]
    out = M.multi_pairing_sharded(mesh, G1m.g1_from_ints(g1s), G2m.g2_from_ints(g2s))
    got = F12.fq12_to_int_coeffs(out)[0]
    expect = o.final_exp(o.multi_miller_loop(list(zip(g1s, g2s))))
    assert got == expect


def test_multi_pairing_sharded_matches_oracle():
    from pairing_tpu.curves import g1 as G1m
    from pairing_tpu.curves import g2 as G2m
    from pairing_tpu.utils import bn254 as c

    n = 8
    mesh = M.make_mesh((n,), ("pairs",))
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(n)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(n)
    ]
    ps = G1m.g1_from_ints(g1s)
    qs = G2m.g2_from_ints(g2s)
    out = M.multi_pairing_sharded(mesh, ps, qs)
    got = F12.fq12_to_int_coeffs(out)[0]
    expect = o.final_exp(o.multi_miller_loop(list(zip(g1s, g2s))))
    assert got == expect


def test_pairing_stream_checkpoint(tmp_path):
    from pairing_tpu.parallel.runner import pairing_stream
    from pairing_tpu.utils.config import PairingConfig

    n = 6
    g1s = [o.g1_mul((1, 2), 3 + i) for i in range(n)]
    from pairing_tpu.utils import bn254 as cc

    g2s = [o.g2_mul((cc.G2_GEN_X, cc.G2_GEN_Y), 5 + i) for i in range(n)]
    cfg = PairingConfig(chunk_size=4, checkpoint_dir=str(tmp_path))
    out1 = [c for c in pairing_stream(g1s, g2s, cfg)]
    assert sum(len(c) for c in out1) == n
    # resume: second run must reuse checkpoints (same values)
    out2 = [c for c in pairing_stream(g1s, g2s, cfg)]
    for a, b in zip(out1, out2):
        assert a.tolist() == b.tolist()
    # spot-check one value vs oracle
    assert F12.fq12_limbs_to_int_coeffs(out1[0][1]) == [o.pairing(g1s[1], g2s[1])]
    # resume against DIFFERENT inputs must refuse, not yield stale chunks
    g1s_bad = list(g1s)
    g1s_bad[0] = o.g1_mul((1, 2), 99)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different"):
        next(iter(pairing_stream(g1s_bad, g2s, cfg)))
