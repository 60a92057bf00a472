"""Native host limb codec (pairing_tpu.native) vs Python ground truth.

The C codec is the host-runtime analogue of the reference's native
bigint layer (arkworks Fq, pairing.rs); these tests pin it bit-for-bit
to the pure-Python limb math in fields.fp for every entry point, on
adversarial values (0, 1, p-1, p, 2p-1, random redundant encodings).
"""

import random
import shutil

import numpy as np
import pytest

from pairing_tpu import native
from pairing_tpu.fields.fp import MASK, NLIMBS, RADIX_BITS, int_to_limbs
from pairing_tpu.utils.bn254 import P

R = 1 << (RADIX_BITS * NLIMBS)
R_INV = pow(R, -1, P)
RNG = random.Random(42)


def limbs_of(v: int) -> np.ndarray:
    return np.asarray(int_to_limbs(v), np.int32)


def val_of(limbs) -> int:
    return sum(int(x) << (RADIX_BITS * i) for i, x in enumerate(limbs))


EDGE = [0, 1, P - 1, P, P + 1, 2 * P - 1, R - 1]
RANDOM = [RNG.randrange(0, 2 * P) for _ in range(64)]


@pytest.mark.skipif(
    not any(shutil.which(cc) for cc in ("cc", "gcc", "clang", "g++")),
    reason="no C toolchain; pure-Python fallback is the valid backend",
)
def test_backend_reported():
    # When a toolchain exists the native path must actually build and be
    # exercised; machines without one run the documented Python fallback.
    assert native.available(), "C toolchain present but codec not built"


@pytest.mark.parametrize("from_mont", [False, True])
def test_canon_limbs(from_mont):
    vals = EDGE + RANDOM
    arr = np.stack([limbs_of(v) for v in vals])
    out = native.canon_limbs(arr, from_mont=from_mont)
    for v, row in zip(vals, out):
        expect = (v * R_INV) % P if from_mont else v % P
        assert val_of(row) == expect


def test_pack_unpack_roundtrip():
    vals = [v % P for v in EDGE + RANDOM]
    arr = np.stack([limbs_of(v) for v in vals])
    packed = native.pack_canonical(arr)
    assert packed.shape == (len(vals), 32)
    for v, row in zip(vals, packed):
        assert int.from_bytes(row.tobytes(), "little") == v
    back = native.unpack_bytes(packed)
    assert np.array_equal(back, arr)


@pytest.mark.parametrize("from_mont", [False, True])
def test_canon_pack_matches_two_step(from_mont):
    vals = EDGE + RANDOM
    arr = np.stack([limbs_of(v) for v in vals])
    one = native.canon_pack(arr, from_mont=from_mont)
    two = native.pack_canonical(native.canon_limbs(arr, from_mont=from_mont))
    assert np.array_equal(one, two)


def test_unpack_mont_enters_domain():
    vals = [v % P for v in EDGE + RANDOM]
    packed = np.stack(
        [np.frombuffer(v.to_bytes(32, "little"), np.uint8) for v in vals]
    )
    out = native.unpack_mont(packed)
    for v, row in zip(vals, out):
        assert val_of(row) == (v * R) % P


def test_ints_from_limbs_matches_python():
    vals = (EDGE + RANDOM)[:64]
    arr = np.stack([limbs_of(v) for v in vals]).reshape(2, -1, NLIMBS)
    got = native.ints_from_limbs(arr, from_mont=True)
    assert got == [(v * R_INV) % P for v in vals]


@pytest.mark.parametrize("from_mont", [False, True])
def test_unsettled_redundant_inputs(from_mont):
    """Limbs above the radix (carry-pending device outputs) canonicalize
    by value, not by digit pattern — including values >= R in every limb
    (the complete-reduction loop's worst region: all limbs at ~2^17)."""
    rows = [
        np.full((NLIMBS,), (1 << 17) - 1, np.int32),  # value ~16R, > R
        np.asarray([0] * (NLIMBS - 1) + [1 << 17], np.int32),
    ]
    for _ in range(16):
        rows.append(
            np.asarray(
                [RNG.randrange(0, (1 << 17) + 1) for _ in range(NLIMBS)],
                np.int32,
            )
        )
    arr = np.stack(rows)
    vals = [val_of(r) for r in rows]
    out = native.canon_limbs(arr, from_mont=from_mont)
    R_INV_ = pow(R, -1, P)
    for v, row in zip(vals, out):
        expect = (v * R_INV_) % P if from_mont else v % P
        assert val_of(row) == expect


@pytest.mark.parametrize("from_mont", [False, True])
def test_settled_limb_budget_boundary(from_mont):
    """All limbs at exactly 2^18 — the documented contract boundary —
    must still canonicalize by value (value ~32R, quotient < 33p, inside
    lc_redc's 40-round budget)."""
    row = np.full((NLIMBS,), 1 << 18, np.int32)
    v = val_of(row)
    out = native.canon_limbs(row[None], from_mont=from_mont)[0]
    expect = (v * R_INV) % P if from_mont else v % P
    assert val_of(out) == expect


@pytest.mark.parametrize("fn", ["canon_limbs", "canon_pack"])
def test_settled_limb_budget_rejected(fn):
    """Limbs beyond 2^18 or negative are outside the REDC contract and
    must raise, not return a wrong residue (round-2 advisor finding)."""
    too_big = np.full((1, NLIMBS), (1 << 18) + 1, np.int32)
    negative = np.zeros((1, NLIMBS), np.int32)
    negative[0, 0] = -1
    f = getattr(native, fn)
    for bad in (too_big, negative):
        with pytest.raises(ValueError, match="settled-limb contract"):
            f(bad, from_mont=True)


def test_python_fallback_paths_agree(monkeypatch):
    """Force the fallback and pin it to the native results."""
    vals = EDGE + RANDOM[:8]
    arr = np.stack([limbs_of(v) for v in vals])
    native_canon = native.canon_limbs(arr, from_mont=True)
    native_pack = native.pack_canonical(native_canon)
    native_mont = native.unpack_mont(native_pack)
    monkeypatch.setattr(native, "_lib", lambda: None)
    assert np.array_equal(native.canon_limbs(arr, True), native_canon)
    assert np.array_equal(native.pack_canonical(native_canon), native_pack)
    assert np.array_equal(native.unpack_mont(native_pack), native_mont)
    assert np.array_equal(native.unpack_bytes(native_pack), native_canon)
