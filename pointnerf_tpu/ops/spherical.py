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


def _sh_basis_recurrence(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Arbitrary-degree real SH via associated-Legendre recurrences.

    Replaces the reference's scipy/table machinery for degrees beyond the
    hardcoded bands (utils/spherical.py:9-236 builds the basis for any
    degree at runtime). Same convention as the closed forms below
    (Condon-Shortley phase folded into P, band-major m = -l..l ordering):
      Y_l^{-m} = sqrt(2) K_l^m sin(m phi) P_l^m,  Y_l^0 = K_l^0 P_l^0,
      Y_l^{+m} = sqrt(2) K_l^m cos(m phi) P_l^m.
    sin^m(theta)cos/sin(m phi) ride the planar recurrence
    A_m = x A_{m-1} - y B_{m-1}, B_m = x B_{m-1} + y A_{m-1}; the
    sin^m factor divides out of P via Ptilde_l^m = P_l^m / sin^m(theta),
    a pure polynomial in z. Everything is static Python looping over
    (l, m) emitting fused elementwise ops — jittable at any degree."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    # A[m], B[m]: sin^m cos(m phi), sin^m sin(m phi)
    A = [one]
    B = [jnp.zeros_like(x)]
    for m in range(1, degree):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])
    # Ptil[m][l]: P_l^m / sin^m(theta) (Condon-Shortley included)
    ptil = {}
    for m in range(degree):
        pmm = one * (((-1.0) ** m) * math.prod(range(1, 2 * m, 2)))
        ptil[(m, m)] = pmm
        if m + 1 < degree:
            ptil[(m, m + 1)] = (2 * m + 1) * z * pmm
        for l in range(m + 2, degree):
            ptil[(m, l)] = ((2 * l - 1) * z * ptil[(m, l - 1)]
                            - (l + m - 1) * ptil[(m, l - 2)]) / (l - m)
    out = []
    for l in range(degree):
        for m in range(-l, l + 1):
            am = abs(m)
            k = math.sqrt((2 * l + 1) / (4 * math.pi)
                          * math.factorial(l - am) / math.factorial(l + am))
            p = ptil[(am, l)]
            if m < 0:
                out.append((math.sqrt(2.0) * k) * (B[am] * p))
            elif m == 0:
                out.append(k * p)
            else:
                out.append((math.sqrt(2.0) * k) * (A[am] * p))
    return jnp.stack(out, axis=-1)


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the first `degree`² real SH basis functions.

    dirs: [..., 3] unit directions. Returns [..., degree**2].
    Matches SphericalHarm(_table) up to the shared normalization
    convention. Degrees 1..4 (sh_degree default 4,
    point_aggregators.py:136) use the hardcoded closed forms; higher
    degrees use the Legendre recurrence (same convention, parity-tested)."""
    if degree < 1:
        raise ValueError(f"sh degree {degree} unsupported (>= 1)")
    if degree > 4:
        return _sh_basis_recurrence(degree, dirs)
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
