"""Batched BN254 G2 (sextic twist E': y^2 = x^3 + 3/xi over Fq2).

Replaces the reference's ``G2Affine``/``G2Target`` (SURVEY.md §2.3 C11):
``neg/double/add`` plus the twisted Frobenius endomorphisms
(miller_loop_native.rs:298-312).

TPU-first design: the Miller loop never inverts per step. Point trajectories
run in Jacobian coordinates (``jac_double`` / ``jac_mixed_add``, a=0
formulas) and are converted to affine *in bulk* with one Fermat inversion
per lane (``batch_to_affine``), which is value-identical to the reference's
affine chain because affine coordinates of a group element are unique.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.bn254 import TWIST_B, TWIST_C2, TWIST_C3
from ..fields import fp as F
from ..fields import fp2 as F2
from ..fields.fp2 import Fp2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class G2:
    """Affine point batch over Fq2 (Montgomery domain)."""

    x: Fp2
    y: Fp2

    def tree_flatten(self):
        return (self.x, self.y), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def batch_shape(self):
        return self.x.batch_shape


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class G2Jac:
    """Jacobian point batch: x = X/Z^2, y = Y/Z^3."""

    X: Fp2
    Y: Fp2
    Z: Fp2

    def tree_flatten(self):
        return (self.X, self.Y, self.Z), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def g2_from_ints(points: Sequence[Tuple[Tuple[int, int], Tuple[int, int]]]) -> G2:
    """[((x0,x1),(y0,y1)), ...] host ints -> G2 batch."""
    return G2(
        F2.fp2_stack_from_ints([p[0] for p in points]),
        F2.fp2_stack_from_ints([p[1] for p in points]),
    )


def g2_to_ints(p: G2):
    xs = F2.fp2_to_ints(p.x)
    ys = F2.fp2_to_ints(p.y)
    return [
        ((int(x[0]), int(x[1])), (int(y[0]), int(y[1]))) for x, y in zip(xs, ys)
    ]


def g2_neg(q: G2) -> G2:
    return G2(q.x, F2.neg(q.y))


def g2_select(mask, a: G2, b: G2) -> G2:
    return G2(F2.select(mask, a.x, b.x), F2.select(mask, a.y, b.y))


def g2_on_curve(q: G2):
    y2 = F2.square(q.y)
    x3 = F2.mul(F2.square(q.x), q.x)
    rhs = F2.add(x3, F2.fp2_from_ints(TWIST_B, q.batch_shape))
    return F2.eq(y2, rhs)


def g2_double_affine(q: G2) -> G2:
    """Affine doubling (one inversion) — reference-parity oracle path."""
    lam = F2.mul(F2.scale(F2.square(q.x), 3), F2.inv(F2.scale(q.y, 2)))
    x3 = F2.sub(F2.square(lam), F2.scale(q.x, 2))
    y3 = F2.sub(F2.mul(lam, F2.sub(q.x, x3)), q.y)
    return G2(x3, y3)


def g2_add_affine(a: G2, b: G2) -> G2:
    """Affine unequal addition (one inversion)."""
    lam = F2.mul(F2.sub(b.y, a.y), F2.inv(F2.sub(b.x, a.x)))
    x3 = F2.sub(F2.sub(F2.square(lam), a.x), b.x)
    y3 = F2.sub(F2.mul(lam, F2.sub(a.x, x3)), a.y)
    return G2(x3, y3)


# ---------------------------------------------------------------------------
# Jacobian trajectory ops (a = 0 twist)
# ---------------------------------------------------------------------------


def jac_from_affine(q: G2) -> G2Jac:
    return G2Jac(q.x, q.y, F2.one_mont(q.batch_shape))


def jac_double(p: G2Jac) -> G2Jac:
    """dbl-2009-l (a=0): 2M + 5S."""
    A = F2.square(p.X)
    B = F2.square(p.Y)
    C = F2.square(B)
    t = F2.square(F2.add(p.X, B))
    D = F2.scale(F2.sub(F2.sub(t, A), C), 2)
    E = F2.scale(A, 3)
    Fv = F2.square(E)
    X3 = F2.sub(Fv, F2.scale(D, 2))
    Y3 = F2.sub(F2.mul(E, F2.sub(D, X3)), F2.scale(C, 8))
    Z3 = F2.scale(F2.mul(p.Y, p.Z), 2)
    return G2Jac(X3, Y3, Z3)


def jac_mixed_add(p: G2Jac, q: G2) -> G2Jac:
    """madd-2007-bl: Jacobian += affine; 7M + 4S.

    Assumes p != +-q (guaranteed along Miller trajectories of valid
    r-torsion inputs, matching the reference's implicit assumption).
    """
    Z1Z1 = F2.square(p.Z)
    U2 = F2.mul(q.x, Z1Z1)
    S2 = F2.mul(F2.mul(q.y, p.Z), Z1Z1)
    H = F2.sub(U2, p.X)
    HH = F2.square(H)
    I = F2.scale(HH, 4)
    J = F2.mul(H, I)
    r = F2.scale(F2.sub(S2, p.Y), 2)
    V = F2.mul(p.X, I)
    X3 = F2.sub(F2.sub(F2.square(r), J), F2.scale(V, 2))
    Y3 = F2.sub(F2.mul(r, F2.sub(V, X3)), F2.scale(F2.mul(p.Y, J), 2))
    Z3 = F2.sub(F2.sub(F2.square(F2.add(p.Z, H)), Z1Z1), HH)
    return G2Jac(X3, Y3, Z3)


def jac_select(mask, a: G2Jac, b: G2Jac) -> G2Jac:
    return G2Jac(
        F2.select(mask, a.X, b.X),
        F2.select(mask, a.Y, b.Y),
        F2.select(mask, a.Z, b.Z),
    )


def batch_to_affine(pts: G2Jac) -> G2:
    """Normalize a *stack* of Jacobian points (leading axis = trajectory /
    any extra batch dim) to affine with ONE Fp inversion per lane.

    Montgomery's trick runs along axis 0 (prefix products forward,
    running-inverse backward) — as fused Pallas kernels on TPU, lax.scans
    elsewhere; the single Fermat inversion then amortizes over all N
    points. This replaces the reference's ~90 per-step affine inversions
    per Miller loop (SURVEY.md §7.2 step 3).
    """
    from ..ops import dispatch

    if dispatch.use_pallas():
        return _batch_to_affine_pallas(pts)
    Z = F2.cap(pts.Z)
    inner_shape = Z.batch_shape[1:]
    one = F2.cap(F2.one_mont(inner_shape))

    def fwd(carry, z):
        zf = F2.from_limbs(z)
        nxt = F2.cap(F2.mul(F2.from_limbs(carry), zf))
        return F2.to_limbs(nxt), carry  # emit prefix[i] = prod z[0..i-1]

    total, prefix = jax.lax.scan(fwd, F2.to_limbs(one), F2.to_limbs(Z))
    tinv = F2.cap(F2.inv(F2.from_limbs(total)))

    def bwd(carry, xs):
        z, pre = xs
        zinv = F2.cap(F2.mul(F2.from_limbs(carry), F2.from_limbs(pre)))
        nxt = F2.cap(F2.mul(F2.from_limbs(carry), F2.from_limbs(z)))
        return F2.to_limbs(nxt), F2.to_limbs(zinv)

    _, zinv_limbs = jax.lax.scan(
        bwd, F2.to_limbs(tinv), (F2.to_limbs(Z), prefix), reverse=True
    )
    zinv = F2.from_limbs(zinv_limbs)  # [N, ...] stacked Fp2
    zinv2 = F2.square(zinv)
    zinv3 = F2.mul(zinv2, zinv)
    return G2(x=F2.mul(pts.X, zinv2), y=F2.mul(pts.Y, zinv3))


# ---------------------------------------------------------------------------
# Subgroup membership (input validation)
# ---------------------------------------------------------------------------


def g2_in_subgroup(q: G2) -> jnp.ndarray:
    """Exact r-torsion membership test: psi(Q) == [6x^2]Q, batched.

    The untwist-Frobenius endomorphism psi (``twisted_frobenius``) acts on
    G2 as multiplication by t-1 = 6x^2. Conversely any on-twist Q with
    psi(Q) = [6x^2]Q satisfies [(6x^2)^2 - t(6x^2) + p]Q = [p+1-t]Q =
    [#E(Fp)]Q = [r]Q = O (the BN G1 cofactor is 1), so the test accepts
    exactly the r-torsion. The reference performs no such check
    (miller_loop_native.rs trusts its inputs); this is the validation
    surface SURVEY.md §5 calls for.

    Preconditions: Q on the twist (``g2_on_curve``) and not infinity. For
    small-order Q the [6x^2] ladder can degenerate (mixed-add collision
    drives Z to 0); all such collapses are rejected by the Z != 0 term.
    Returns bool [batch].
    """
    from ..utils.bn254 import BN_X, get_naf

    naf = get_naf(6 * BN_X * BN_X)
    assert naf[-1] == 1
    digits = jnp.asarray(naf[-2::-1], jnp.int32)  # high-to-low, top consumed

    nq = g2_neg(q)

    def jcap(j: G2Jac) -> G2Jac:
        return G2Jac(F2.cap(j.X), F2.cap(j.Y), F2.cap(j.Z))

    def body(acc, d):
        acc = jcap(jac_double(acc))
        y_sel = F2.select(d > 0, q.y, nq.y)
        added = jcap(jac_mixed_add(acc, G2(q.x, y_sel)))
        return jac_select(d != 0, added, acc), None

    acc0 = jcap(jac_double(jac_from_affine(q)))
    d0 = digits[0]
    acc0 = jac_select(
        d0 != 0,
        jcap(jac_mixed_add(acc0, G2(q.x, F2.select(d0 > 0, q.y, nq.y)))),
        acc0,
    )
    acc, _ = jax.lax.scan(body, acc0, digits[1:])

    psi = twisted_frobenius(q)
    zz = F2.square(acc.Z)
    zzz = F2.mul(zz, acc.Z)
    z_nonzero = jnp.logical_not(
        jnp.logical_and(F.fp_is_zero(acc.Z.c0), F.fp_is_zero(acc.Z.c1))
    )
    return (
        F2.eq(acc.X, F2.mul(psi.x, zz))
        & F2.eq(acc.Y, F2.mul(psi.y, zzz))
        & z_nonzero
    )


# ---------------------------------------------------------------------------
# Twisted Frobenius endomorphisms
# ---------------------------------------------------------------------------


def twisted_frobenius(q: G2) -> G2:
    """(c2 * conj(x), c3 * conj(y)) (miller_loop_native.rs:298-304)."""
    c2 = F2.fp2_from_ints(TWIST_C2, q.batch_shape)
    c3 = F2.fp2_from_ints(TWIST_C3, q.batch_shape)
    return G2(F2.mul(c2, F2.conj(q.x)), F2.mul(c3, F2.conj(q.y)))


def neg_twisted_frobenius(q: G2) -> G2:
    """(c2 * conj(x), c3 * neg_conj(y)) (miller_loop_native.rs:306-312)."""
    c2 = F2.fp2_from_ints(TWIST_C2, q.batch_shape)
    c3 = F2.fp2_from_ints(TWIST_C3, q.batch_shape)
    return G2(F2.mul(c2, F2.conj(q.x)), F2.mul(c3, F2.neg_conj(q.y)))


def _fp2_stack_to_kl(v: Fp2):
    """Fp2 with batch [N, *inner] -> ([N, 2, L, R, 128], inner, pad)."""
    c0 = F._cap_2p(v.c0).limbs
    c1 = F._cap_2p(v.c1).limbs
    n = c0.shape[0]
    inner = c0.shape[1:-1]
    L = c0.shape[-1]
    flat = jnp.stack([c0.reshape(n, -1, L), c1.reshape(n, -1, L)], axis=1)
    b = flat.shape[2]
    pad = (-b) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nb = flat.shape[2]
    arr = jnp.moveaxis(flat, -1, 2).reshape(n, 2, L, nb // 128, 128)
    return arr, inner, pad


def _fp2_stack_from_kl(arr, inner, pad) -> Fp2:
    from ..utils.bn254 import P as _P

    n = arr.shape[0]
    L = arr.shape[2]
    nb = arr.shape[3] * 128
    flat = jnp.moveaxis(arr.reshape(n, 2, L, nb), 2, -1)  # [N, 2, B, L]
    if pad:
        flat = flat[:, :, : nb - pad]
    full = flat.reshape((n, 2) + inner + (L,))
    return Fp2(
        F.Fp(full[:, 0], 2 * _P, F.SETTLED), F.Fp(full[:, 1], 2 * _P, F.SETTLED)
    )


def _batch_to_affine_pallas(pts: G2Jac) -> G2:
    """Phase N with the prefix/suffix passes as Pallas kernels."""
    from ..ops.norm_kernels import prefix_products_pallas, running_inverse_pallas
    from ..utils.bn254 import P as _P

    z_arr, inner, pad = _fp2_stack_to_kl(pts.Z)
    prefix, total = prefix_products_pallas(z_arr)

    # total inverse on the flat batch (pallas Fermat ladder inside F2.inv)
    total_fp2 = _fp2_stack_from_kl(total[None], inner, pad)
    tinv = F2.cap(F2.inv(Fp2(
        F.Fp(total_fp2.c0.limbs[0], 2 * _P, F.SETTLED),
        F.Fp(total_fp2.c1.limbs[0], 2 * _P, F.SETTLED),
    )))
    tinv_arr, _, _ = _fp2_stack_to_kl(
        Fp2(
            F.Fp(tinv.c0.limbs[None], 2 * _P, F.SETTLED),
            F.Fp(tinv.c1.limbs[None], 2 * _P, F.SETTLED),
        )
    )
    zinv_arr = running_inverse_pallas(z_arr, prefix, tinv_arr[0])
    zinv = _fp2_stack_from_kl(zinv_arr, inner, pad)

    zinv2 = F2.square(zinv)
    zinv3 = F2.mul(zinv2, zinv)
    return G2(x=F2.mul(pts.X, zinv2), y=F2.mul(pts.Y, zinv3))
