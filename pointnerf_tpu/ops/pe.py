"""Positional encoding, matching the reference layout exactly.

reference: models/helpers/networks.py:175-190 — for input [..., D] and F freqs:
  base[..., d*F + f] = x_d * 2^f
  non-ori output [..., 2DF]: interleaved (sin(base_0), cos(base_0), sin(base_1), ...)
  ori=True output [..., D + 2DF]: [x, sin(base), cos(base)] (blocked, not interleaved)
"""
from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, freqs: int, ori: bool = False) -> jnp.ndarray:
    if freqs <= 0:
        return x
    fb = 2.0 ** jnp.arange(freqs, dtype=x.dtype)  # [F]
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (x.shape[-1] * freqs,))
    if ori:
        return jnp.concatenate([x, jnp.sin(base), jnp.cos(base)], axis=-1)
    inter = jnp.stack([jnp.sin(base), jnp.cos(base)], axis=-1)
    return inter.reshape(x.shape[:-1] + (x.shape[-1] * freqs * 2,))


def pe_dim(d: int, freqs: int, ori: bool = False) -> int:
    if freqs <= 0:
        return d
    return d + 2 * d * freqs if ori else 2 * d * freqs
