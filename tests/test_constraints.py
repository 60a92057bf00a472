"""Limb-level AIR constraint evaluator tests (VERDICT r3 item 3).

The evaluator must accept a faithful witness and reject a single-limb
perturbation of ANY recorded column — at the limb level (polynomial
identities + Hensel divisibility), not via value replay.
"""

import random

import jax
import numpy as np
import pytest

from pairing_tpu.curves import g1 as G1m
from pairing_tpu.curves import g2 as G2m
from pairing_tpu.fields.fp import NLIMBS, P_LIMBS, int_to_limbs
from pairing_tpu.oracle import native as o
from pairing_tpu.utils import bn254 as c
from pairing_tpu.witness import load_pairing_witness, save_pairing_witness
from pairing_tpu.witness.constraints import (
    ConstraintError,
    _identity,
    check_pairing_constraints,
)
from pairing_tpu.witness.trace import pairing_witness

RNG = random.Random(271828)
R = 1 << (13 * NLIMBS)


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
    meta, data = load_pairing_witness(path)
    return meta, data


# ---------------------------------------------------------------------------
# Unit: the core limb identity checker
# ---------------------------------------------------------------------------


def _mont_row(v: int) -> np.ndarray:
    return int_to_limbs(v * R % c.P).astype(np.int64)[None, :]


def test_identity_montgomery_product():
    """conv(a,b) - c*R must accept the true Montgomery product and reject
    any single-limb perturbation of a, b, or c."""
    report = {}
    a_v = RNG.randrange(c.P)
    b_v = RNG.randrange(c.P)
    c_v = a_v * b_v % c.P
    a, b, cc = _mont_row(a_v), _mont_row(b_v), _mont_row(c_v)
    _identity("unit.ok", report, [(a, b, 1)], [(cc, -1, NLIMBS)])
    assert report["unit.ok"] == 1
    for arr in (a, b, cc):
        bad = arr.copy()
        bad[0, RNG.randrange(NLIMBS)] += 1
        args = [
            x if x is not arr else bad for x in (a, b)
        ]
        lin = cc if arr is not cc else bad
        with pytest.raises(ConstraintError):
            _identity(
                "unit.bad", {}, [(args[0], args[1], 1)], [(lin, -1, NLIMBS)]
            )


def test_identity_rejects_wrong_scale():
    report = {}
    a_v = RNG.randrange(c.P)
    a = _mont_row(a_v)
    c2 = _mont_row(2 * a_v % c.P)
    _identity("unit.lin", report, [], [(a, 2, 0), (c2, -1, 0)])
    with pytest.raises(ConstraintError):
        _identity("unit.lin.bad", {}, [], [(a, 3, 0), (c2, -1, 0)])


def test_identity_redundant_operands():
    """Operands in redundant (non-canonical) form satisfy the same
    identities: it is a mod-p statement over limb vectors."""
    a_v = RNG.randrange(c.P)
    b_v = RNG.randrange(c.P)
    # redundant encoding: add p to the value, with limbs still <= 2^13
    a = int_to_limbs((a_v * R + 0) % c.P + c.P).astype(np.int64)[None, :]
    b = _mont_row(b_v)
    cc = _mont_row(a_v * b_v % c.P)
    _identity("unit.red", {}, [(a, b, 1)], [(cc, -1, NLIMBS)])


# ---------------------------------------------------------------------------
# End-to-end over a real witness
# ---------------------------------------------------------------------------


def test_constraints_accept_valid_witness(witness_file):
    meta, data = witness_file
    report = check_pairing_constraints(meta, data, lanes=[0])
    for prefix in (
        "range", "range_bits", "exp_bits_recompose",
        "traj_init.x", "traj_double.slope", "traj_double.x", "traj_double.y",
        "traj_add.1.slope", "traj_copy.x",
        "q1.x", "nq2.y", "st91.slope",
        "tg_sqx", "tg_line.c0.c0", "tg_line.c3.c0", "tg_line.c4.c1",
        "ch_line.1.c2.c0", "ep_line.0.c5.c0", "ep_line.1.c2.c1",
        "easy_frob2.s0", "hard_frob.m1.s3",
        "fq12_mul.s0.c0", "fq12_mul.s5.c1",
        "exp_copy.0", "exp_splice.2",
    ):
        n = sum(v for k, v in report.items() if k.startswith(prefix))
        assert n > 0, f"identity group {prefix} never ran"


PERTURB = [
    ("p_x", (0, 0, 4)),
    ("q_y", (0, 0, 1, 7)),
    ("r_affine_x", (70, 0, 0, 0, 2)),   # a post-double trajectory state
    ("r_affine_y", (12, 0, 0, 1, 9)),   # a loop-top state
    ("tg_lines", (10, 0, 0, 1, 0, 4)),
    ("ch_lines", (3, 0, 0, 2, 1, 6)),
    ("ep_lines", (1, 0, 0, 0, 0, 3)),
    ("q1_x", (0, 0, 0, 11)),
    ("nq2_y", (0, 0, 1, 5)),
    ("f_steps", (40, 0, 3, 5)),
    ("miller_out", (0, 7, 2)),
    ("easy_out", (0, 2, 8)),
    ("exp_rows", (1, 20, 0, 7, 1)),
    ("exp_outs", (2, 0, 4, 6)),
    ("final_out", (0, 9, 10)),
    # schema-v2 committed aux wires: perturbations must be rejected too
    ("tg_lambda", (17, 0, 0, 0, 6)),
    ("tg_sqx", (30, 0, 0, 1, 12)),
    ("ch_mu", (4, 0, 0, 1, 3)),
    ("ep_mu", (0, 0, 0, 8)),
    ("f_sq", (22, 0, 5, 14)),
    ("f_mid", (9, 0, 8, 2)),
    ("ep_mid", (0, 0, 11, 4)),
    ("inv_m", (0, 1, 9)),
    ("easy_mid", (0, 6, 0)),
    ("easy_frob", (0, 10, 17)),
    ("exp_sq", (2, 33, 0, 4, 7)),
    ("hard_frob", (3, 0, 2, 11)),
    ("hard_mid", (12, 0, 7, 19)),
]


@pytest.mark.parametrize("entry,index", PERTURB)
def test_single_limb_perturbation_rejected(witness_file, entry, index):
    meta, data = witness_file
    data = {k: v.copy() for k, v in data.items()}
    data[entry][index] += 1
    with pytest.raises(ConstraintError):
        check_pairing_constraints(meta, data, lanes=[0])


def test_exp_bits_perturbation_rejected(witness_file):
    meta, data = witness_file
    data = {k: v.copy() for k, v in data.items()}
    data["exp_bits"][5] ^= 1
    with pytest.raises(ConstraintError):
        check_pairing_constraints(meta, data, lanes=[0])


# ---------------------------------------------------------------------------
# K=2 multi-pairing layout (VERDICT r4 item 3): the shared-squaring chain
# loops factors over meta["k"]; exercise the K-path end to end.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def multi_witness_file(tmp_path_factory):
    import jax.numpy as jnp

    from pairing_tpu.witness.trace import multi_pairing_witness

    K, B = 2, 1
    g1s = [o.g1_mul(c.G1_GEN, RNG.randrange(1, c.R_SCALAR)) for _ in range(K * B)]
    g2s = [
        o.g2_mul((c.G2_GEN_X, c.G2_GEN_Y), RNG.randrange(1, c.R_SCALAR))
        for _ in range(K * B)
    ]
    resh = lambda a: jnp.moveaxis(a.reshape((B, K) + a.shape[1:]), 0, 1)
    p = jax.tree.map(resh, G1m.g1_from_ints(g1s))
    q = jax.tree.map(resh, G2m.g2_from_ints(g2s))
    out, trace = jax.jit(multi_pairing_witness)(p, q)
    path = str(tmp_path_factory.mktemp("wit") / "multi_witness.npz")
    save_pairing_witness(path, p, q, out, trace)
    meta, data = load_pairing_witness(path)
    return meta, data


def test_constraints_accept_k2_witness(multi_witness_file):
    meta, data = multi_witness_file
    assert meta["k"] == 2
    # K=2 mid layout: zero-digit steps commit 1 mid, add steps 3
    assert data["f_mid"].shape[0] == 39 * 1 + 25 * 3
    assert data["ep_mid"].shape[0] == 3
    report = check_pairing_constraints(meta, data)
    assert report["fq12_mul.s0.c0"] > 0
    assert report["traj_add.1.slope.c0"] > 0


K2_PERTURB = [
    # per-pair (k=1) columns: the K-loop indexing is what these catch
    ("tg_lines", (10, 1, 0, 1, 0, 4)),
    ("ch_lines", (3, 1, 0, 2, 1, 6)),
    ("r_affine_x", (70, 1, 0, 0, 2)),
    ("ch_mu", (4, 1, 0, 1, 3)),
    ("f_mid", (50, 0, 8, 2)),      # a chord-stage mid of the K=2 chain
    ("ep_mid", (2, 0, 11, 4)),     # pair-1 epilogue intermediate
    ("ep_lines", (1, 1, 0, 0, 0, 3)),
]


@pytest.mark.parametrize("entry,index", K2_PERTURB)
def test_k2_perturbation_rejected(multi_witness_file, entry, index):
    meta, data = multi_witness_file
    data = {k: v.copy() for k, v in data.items()}
    data[entry][index] += 1
    with pytest.raises(ConstraintError):
        check_pairing_constraints(meta, data)
