"""Real spherical harmonics basis evaluation.

Replaces the reference's scipy-based runtime/table SH
(utils/spherical.py:9-236, used by the `sh_intrp` aggregation kernel
point_aggregators.py:460-470 and the `harmonics` render func
base_rendering_model.py:428-444). Closed-form hardcoded bands up to degree 4
(16 coefficients) — branch-free polynomial evaluation that XLA fuses into
the surrounding elementwise work; no scipy at runtime.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

# band constants (standard real SH normalization)
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the first `degree`² real SH basis functions.

    dirs: [..., 3] unit directions. Returns [..., degree**2].
    Matches SphericalHarm(_table) up to the shared normalization convention;
    supports degree 1..4 (sh_degree default 4, point_aggregators.py:136)."""
    if not 1 <= degree <= 4:
        raise ValueError(f"sh degree {degree} unsupported (1..4)")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, _C0, dirs.dtype)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [_C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz, _C2[4] * (xx - yy)]
    if degree > 3:
        out += [_C3[0] * y * (3 * xx - yy), _C3[1] * xy * z,
                _C3[2] * y * (4 * zz - xx - yy),
                _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                _C3[4] * x * (4 * zz - xx - yy),
                _C3[5] * z * (xx - yy), _C3[6] * x * (xx - 3 * yy)]
    return jnp.stack(out, axis=-1)


def sh_eval(coeffs: jnp.ndarray, dirs: jnp.ndarray, degree: int
            ) -> jnp.ndarray:
    """Weighted SH reconstruction: coeffs [..., degree², C] x basis."""
    b = sh_basis(degree, dirs)                      # [..., n]
    return jnp.sum(coeffs * b[..., None], axis=-2)
