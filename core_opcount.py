"""Exact trace-time tile-op accounting for the in-kernel cores.

Feeds the production cores a counting operand type (every arithmetic op
on an [8,128] tile = one VPU tile-op) to get EXACT per-core op counts by
category — the numerator of the ALU-side roofline — plus the VMEM
load/store traffic of reads/writes through the getter/setter interface.
No hardware needed; the counts are static properties of the traced core.

Usage: python core_opcount.py
"""

import numpy as np

COUNTS = {"mul": 0, "add": 0, "and": 0, "shift": 0, "where": 0, "cmp": 0}
LOADS = [0]
STORES = [0]


class T:
    """Counting stand-in for an [8,128] int32 tile."""

    __slots__ = ()

    def _b(self, kind):
        COUNTS[kind] += 1
        return T()

    def __mul__(self, o):
        return self._b("mul")

    def __rmul__(self, o):
        return self._b("mul")

    def __add__(self, o):
        return self._b("add")

    def __radd__(self, o):
        return self._b("add")

    def __sub__(self, o):
        return self._b("add")

    def __rsub__(self, o):
        return self._b("add")

    def __neg__(self):
        return self._b("add")

    def __and__(self, o):
        return self._b("and")

    def __rshift__(self, o):
        return self._b("shift")

    def __lshift__(self, o):
        return self._b("shift")

    def __or__(self, o):
        return self._b("and")

    def __ne__(self, o):
        return self._b("cmp")

    def astype(self, dt):
        return T()


def reset():
    for k in COUNTS:
        COUNTS[k] = 0
    LOADS[0] = 0
    STORES[0] = 0


def snap(label, n_wide_muls=None):
    total = sum(COUNTS.values())
    ns = total / 5.14  # 5.14G tile-ops/s measured VPU rate
    print(
        f"{label:26s} ops={total:6d} (mul {COUNTS['mul']:5d}, add "
        f"{COUNTS['add']:5d}, and {COUNTS['and']:4d}, shift "
        f"{COUNTS['shift']:4d}) loads={LOADS[0]:5d} stores={STORES[0]:4d} "
        f"op-model={ns/1000:6.1f}us/2048lanes"
        + (f"  [{n_wide_muls} wide muls]" if n_wide_muls else "")
    )
    return total


def a_get(c, l):
    LOADS[0] += 1
    return T()


def out_set(seg, limbs):
    STORES[0] += len(limbs)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Patch jnp.where used by k_select paths (not hit by dense cores).
    from pairing_tpu.ops import fq12_kernels as OK
    from pairing_tpu.ops import kernel_core as K

    print("per 1024-lane tile-op counts; op-model assumes 5.14G tile-ops/s")
    print("(x2 for a 2048-lane grid step as measured by probe_bench)\n")

    reset()
    OK._mul_core_v2(a_get, a_get, out_set)
    snap("dense mul v2 (63 kw)", 63)

    reset()
    OK._mul_core_v3(a_get, a_get, out_set)
    snap("dense mul v3 (54 kw)", 54)

    reset()
    OK._sq_core_v2(a_get, out_set)
    snap("dense sq v2 (42 kw)", 42)

    reset()
    OK._sq_core_v3(a_get, out_set)
    snap("dense sq v3 (36 kw)", 36)

    reset()
    OK._sparse_core_v2((0, 3, 4), a_get, lambda jj, cc, l: a_get(0, l), out_set)
    snap("sparse 034 (54 kw)", 54)

    reset()
    slots = [([a_get(0, l) for l in range(21)], [a_get(0, l) for l in range(21)])
             for _ in range(6)]
    out = K.k_cyc_sq(slots)
    STORES[0] += sum(len(c[0]) + len(c[1]) for c in out)
    snap("cyclotomic sq (18 kw)")

    # isolate the Montgomery reduce and the wide-mul primitive
    reset()
    K.k_mont_reduce([T() for _ in range(44)], limb_bound=1 << 17)
    snap("k_mont_reduce (1 component)")

    reset()
    from pairing_tpu.ops import kwide as W

    a = W.K2([T() for _ in range(21)], [T() for _ in range(21)], 2 * 21889 ** 21)
    reset()
    W.k2w_mul(a, a)
    snap("k2w_mul (3 kw, no reduce)")

    reset()
    W.kw_prod([T() for _ in range(21)], [T() for _ in range(21)],
              (1 << 250), (1 << 250))
    snap("kw_prod (1 wide mul)")


if __name__ == "__main__":
    main()
