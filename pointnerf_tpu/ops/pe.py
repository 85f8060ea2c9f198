"""Positional encoding, matching the reference layout exactly.

reference: models/helpers/networks.py:175-190 — for input [..., D] and F freqs:
  base[..., d*F + f] = x_d * 2^f
  non-ori output [..., 2DF]: interleaved (sin(base_0), cos(base_0), sin(base_1), ...)
  ori=True output [..., D + 2DF]: [x, sin(base), cos(base)] (blocked, not interleaved)

The non-ori path carries a custom VJP: the naive autodiff backward reduces the
cotangent over the tiny freq axis of a [..., D, F, 2] view, which XLA lays out
as a T(1,128) kLoop fusion using 8 of 128 lanes — 6.1 ms/step at the lego
budget (round-4 device trace, fusion.68). The custom backward keeps everything
flat: dx = (g * T) @ P with T the interleaved (cos, -sin) trig tensor (same
shape/op class as the forward, ~0.75 ms) and P a constant [2DF, D] 0/1*2^f
reduction matrix contracted on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interleave2(base: jnp.ndarray):
    """[..., DF] -> [..., 2DF] with each element repeated twice.

    Lowered as broadcast+reshape (free inside a fusion) — the stack-based
    interleave materialized an [..., DF, 2] intermediate whose T(2,128)
    padded layout cost a real copy per step (round-4 trace: copy.667 +
    pad_maximum_fusion, ~1.4 ms)."""
    out = jnp.broadcast_to(base[..., None], base.shape + (2,))
    return out.reshape(base.shape[:-1] + (base.shape[-1] * 2,))


def _pe_core(x: jnp.ndarray, freqs: int):
    """Returns (sin_interleaved_cos [..., 2DF]) in the reference layout.

    cos(b) = sin(b + pi/2), so the interleaved (sin b, cos b) pairs are ONE
    flat sin over the twice-repeated base plus an alternating phase — no
    stack/interleave copy, same transcendental count. Rounding from the
    pi/2 float32 offset is ~1e-7 absolute (PE oracle tolerance 1e-5)."""
    fb = 2.0 ** jnp.arange(freqs, dtype=x.dtype)  # [F]
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (x.shape[-1] * freqs,))
    phase = jnp.tile(jnp.asarray([0.0, np.pi / 2], x.dtype),
                     base.shape[-1])
    return jnp.sin(_interleave2(base) + phase)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pe_flat(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    return _pe_core(x, freqs)


def _pe_flat_fwd(x, freqs):
    # residual is x, NOT the forward output: saving y would force the
    # forward sine out of its consumer fusion into a standalone
    # materializing kernel (measured 5.5 ms/step regression); recomputing
    # the trig from x in the backward stays fused and costs less
    return _pe_core(x, freqs), x


def _pe_flat_bwd(freqs, x, g):
    d = x.shape[-1]
    fb = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (d * freqs,))
    # T[..., (d*F+f)*2 + j] = cos(base) for j=0 (sin channel), -sin for j=1
    # = sin(base + pi/2), sin(base + pi) — one flat sin, no interleave copy
    phase = jnp.tile(jnp.asarray([np.pi / 2, np.pi], x.dtype),
                     base.shape[-1])
    trig = jnp.sin(_interleave2(base) + phase)
    # P[(dd*F+f)*2 + j, dd] = 2^f — constant; the tiny-axis reduction rides
    # the MXU instead of a lane-starved VPU loop fusion.
    p = np.zeros((d * freqs * 2, d), np.float32)
    for dd in range(d):
        for f in range(freqs):
            p[(dd * freqs + f) * 2: (dd * freqs + f) * 2 + 2, dd] = 2.0 ** f
    # batched matmul (leading dims ride as batch): no flat reshape — the
    # cotangent arrives in the matmul-backward's layout and an explicit
    # [-1, 2DF] reshape forced a relayout copy (round-4 trace, ~1 ms)
    dx = (g * trig) @ jnp.asarray(p, dtype=g.dtype)
    return (dx,)


_pe_flat.defvjp(_pe_flat_fwd, _pe_flat_bwd)


def positional_encoding(x: jnp.ndarray, freqs: int, ori: bool = False) -> jnp.ndarray:
    if freqs <= 0:
        return x
    if not ori:
        return _pe_flat(x, freqs)
    fb = 2.0 ** jnp.arange(freqs, dtype=x.dtype)  # [F]
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (x.shape[-1] * freqs,))
    return jnp.concatenate([x, jnp.sin(base), jnp.cos(base)], axis=-1)


def pe_dim(d: int, freqs: int, ori: bool = False) -> int:
    if freqs <= 0:
        return d
    return d + 2 * d * freqs if ori else 2 * d * freqs
