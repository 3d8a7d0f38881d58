"""Host <-> device conversions for G1 point tensors."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import fp, mp
from . import g1, host_g1


def jac_to_device(points: list[host_g1.JacPoint]) -> g1.G1Jac:
    """Python-int Jacobian points -> Montgomery-form device tensor."""
    r = fp.SPEC.r
    p = fp.P_INT
    xs = np.stack([mp.limbs_from_int(pt.x * r % p, 12) for pt in points])
    ys = np.stack([mp.limbs_from_int(pt.y * r % p, 12) for pt in points])
    zs = np.stack([mp.limbs_from_int(pt.z * r % p, 12) for pt in points])
    return g1.G1Jac(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))


def jac_from_device(t: g1.G1Jac) -> list[host_g1.JacPoint]:
    """Montgomery-form device tensor -> python-int Jacobian points."""
    r_inv = fp.SPEC.r_inv
    p = fp.P_INT
    xs = np.asarray(t.x).reshape(-1, 12)
    ys = np.asarray(t.y).reshape(-1, 12)
    zs = np.asarray(t.z).reshape(-1, 12)
    out = []
    for i in range(xs.shape[0]):
        out.append(
            host_g1.JacPoint(
                mp.int_from_limbs(xs[i]) * r_inv % p,
                mp.int_from_limbs(ys[i]) * r_inv % p,
                mp.int_from_limbs(zs[i]) * r_inv % p,
            )
        )
    return out


def affine_from_device(t: g1.G1Jac) -> list[tuple[int, int] | None]:
    return [host_g1.to_affine(pt) for pt in jac_from_device(t)]
