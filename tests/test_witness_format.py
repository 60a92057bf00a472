"""Witness serialization round-trip + replay-checker tests.

The checker is the `Fq12Target::connect` analogue: it must accept a
faithful trace and reject a corrupted one (VERDICT round-1 item 5).
"""

import random

import jax
import numpy as np
import pytest

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.oracle import native as o
from pairing_tpu.utils import bn254 as c
from pairing_tpu.witness import (
    WitnessError,
    load_pairing_witness,
    save_pairing_witness,
    verify_pairing_witness,
)
from pairing_tpu.witness.trace import pairing_witness

RNG = random.Random(60601)


@pytest.fixture(scope="module")
def witness_file(tmp_path_factory):
    B = 2
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(B)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(B)
    ]
    p = G1m.g1_from_ints(g1s)
    q = G2m.g2_from_ints(g2s)
    out, trace = jax.jit(pairing_witness)(p, q)
    path = str(tmp_path_factory.mktemp("wit") / "pairing_witness.npz")
    save_pairing_witness(path, p, q, out, trace)
    return path, g1s, g2s, out


def test_roundtrip_and_verify(witness_file):
    path, g1s, g2s, out = witness_file
    meta, data = load_pairing_witness(path)
    assert meta["k"] == 1
    assert data["f_steps"].shape[:2] == (64, len(g1s))
    report = verify_pairing_witness(meta, data)
    # every transition class must have been exercised
    for key in (
        "traj_init", "traj_double", "traj_step", "q1", "nq2", "st91",
        "tg_line", "ch_line", "ep_line", "f_step", "miller_out",
        "easy_part", "exp_bits", "exp_row", "exp_splice", "final_out",
    ):
        assert report.get(key, 0) > 0, f"check {key} never ran"
    # and the recorded final output is the true pairing
    from pairing_tpu.fields import fp12 as F12

    assert F12.fq12_to_int_coeffs(out) == [
        o.pairing(g1, g2) for g1, g2 in zip(g1s, g2s)
    ]


@pytest.mark.parametrize(
    "entry,index",
    [
        ("f_steps", (40, 0, 3, 5)),  # a mid-loop accumulator limb
        ("r_affine_x", (70, 0, 0, 0, 2)),  # a post-double trajectory state
        ("exp_rows", (1, 20, 0, 7, 1)),  # an x-power ladder row
        ("tg_lines", (10, 0, 0, 1, 0, 4)),  # a tangent coefficient
    ],
)
def test_corruption_detected(witness_file, entry, index):
    path, _, _, _ = witness_file
    meta, data = load_pairing_witness(path)
    data = {k: v.copy() for k, v in data.items()}
    data[entry][index] += 1
    with pytest.raises(WitnessError):
        verify_pairing_witness(meta, data)
