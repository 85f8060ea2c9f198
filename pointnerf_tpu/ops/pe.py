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


def _pe_core(x: jnp.ndarray, freqs: int):
    """Returns (sin_interleaved_cos [..., 2DF]) in the reference layout."""
    fb = 2.0 ** jnp.arange(freqs, dtype=x.dtype)  # [F]
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (x.shape[-1] * freqs,))
    inter = jnp.stack([jnp.sin(base), jnp.cos(base)], axis=-1)
    return inter.reshape(x.shape[:-1] + (x.shape[-1] * freqs * 2,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pe_flat(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    return _pe_core(x, freqs)


def _pe_flat_fwd(x, freqs):
    return _pe_core(x, freqs), x


def _pe_flat_bwd(freqs, x, g):
    d = x.shape[-1]
    fb = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (d * freqs,))
    # T[..., (d*F+f)*2 + j] = cos(base) for j=0 (sin channel), -sin for j=1
    trig = jnp.stack([jnp.cos(base), -jnp.sin(base)], axis=-1)
    trig = trig.reshape(g.shape)
    # P[(dd*F+f)*2 + j, dd] = 2^f — constant; the tiny-axis reduction rides
    # the MXU instead of a lane-starved VPU loop fusion.
    p = np.zeros((d * freqs * 2, d), np.float32)
    for dd in range(d):
        for f in range(freqs):
            p[(dd * freqs + f) * 2: (dd * freqs + f) * 2 + 2, dd] = 2.0 ** f
    u = (g * trig).reshape((-1, d * freqs * 2))
    dx = u @ jnp.asarray(p, dtype=u.dtype)
    return (dx.reshape(x.shape),)


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
