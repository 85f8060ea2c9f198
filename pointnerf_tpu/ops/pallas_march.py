"""Pallas TPU kernel: single-pass fused ray-march compositor.

The XLA path (models/ray_march.py) materializes opacity, the exclusive
cumulative transmission, and blend weights as separate [R, SR] arrays. This
kernel walks the SR axis once per ray tile in VMEM, carrying transmission in
registers — one HBM read of the inputs, one write of the outputs
(equivalent math to diff_ray_marching.py:509-555).

Differentiation: `pallas_ray_march` carries a custom_vjp whose backward
recomputes through the XLA reference implementation — the kernel accelerates
inference/forward; training gradients stay bit-identical to the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ray_march import alpha_blend, radiance_render, ray_march


def _march_kernel(dist_ref, valid_ref, feat_ref, bg_ref,
                  color_ref, opacity_ref, bgtr_ref):
    """SR-major layout: rays ride the lane axis so the per-sample loop
    slices the (dynamic-indexable) sublane axis of the refs."""
    dist = dist_ref[:]                       # [SR, T]
    valid = valid_ref[:]                     # [SR, T] (f32 0/1)
    # feats block is [SR, C+1, T]: rays on lanes (a trailing C+1 lane axis
    # would pad 4 -> 128 and blow VMEM)
    sigma = feat_ref[:, 0, :] * valid
    opacity = 1.0 - jnp.exp(-sigma * dist)   # [SR, T]
    opacity_ref[:] = opacity

    SR, T = opacity.shape
    C = feat_ref.shape[1] - 1

    def body(s, carry):
        trans, acc = carry                   # [1, T], [C, T]
        op = opacity_ref[pl.ds(s, 1), :]     # [1, T]
        col = feat_ref[pl.ds(s, 1), 1:, :][0]            # [C, T]
        acc = acc + col * (op * trans)
        trans = trans * (1.0 - op + 1e-10)
        return trans, acc

    trans0 = jnp.ones((1, T), jnp.float32)
    acc0 = jnp.zeros((C, T), jnp.float32)
    trans, acc = jax.lax.fori_loop(0, SR, body, (trans0, acc0))
    bgtr_ref[:] = trans
    color_ref[:] = acc + bg_ref[:, :1] * trans


def _pallas_march_fwd_impl(dist, valid, feats, bg, tile: int = 128):
    R, SR = dist.shape
    C = feats.shape[-1] - 1
    pad = (-R) % tile
    if pad:
        dist = jnp.pad(dist, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
    Rp = dist.shape[0]
    # SR-major layout for the kernel (rays on lanes)
    dist_t = dist.T                              # [SR, Rp]
    valid_t = valid.T
    feats_t = jnp.transpose(feats, (1, 2, 0))    # [SR, C+1, Rp]
    color, opacity_t, bgtr = pl.pallas_call(
        _march_kernel,
        grid=(Rp // tile,),
        in_specs=[
            pl.BlockSpec((SR, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SR, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SR, C + 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SR, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, Rp), jnp.float32),
            jax.ShapeDtypeStruct((SR, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        ),
    )(dist_t.astype(jnp.float32), valid_t.astype(jnp.float32),
      feats_t.astype(jnp.float32), bg.reshape(-1, 1).astype(jnp.float32))
    return color.T[:R], opacity_t.T[:R], bgtr.T[:R]


def _xla_march(dist, valid, feats, bg):
    (ray_color, _pc, opacity, _acc, _bw, bg_tr, _bgw) = ray_march(
        dist, valid.astype(bool), feats, radiance_render, alpha_blend, bg)
    return ray_color, opacity, bg_tr


@jax.custom_vjp
def pallas_ray_march(dist, valid, feats, bg):
    """Fused compositor. dist [R,SR]; valid [R,SR]; feats [R,SR,1+C]; bg [C].
    Returns (ray_color [R,C], opacity [R,SR], background_transmission [R,1])."""
    return _pallas_march_fwd_impl(dist, valid.astype(jnp.float32), feats, bg)


def _fwd(dist, valid, feats, bg):
    out = pallas_ray_march(dist, valid, feats, bg)
    return out, (dist, valid, feats, bg)


def _bwd(res, g):
    dist, valid, feats, bg = res
    # recompute through the XLA reference path for gradients
    _, vjp = jax.vjp(lambda d, f, b: _xla_march(d, valid, f, b),
                     dist, feats, bg)
    gd, gf, gb = vjp(g)
    return gd, None, gf, gb


pallas_ray_march.defvjp(_fwd, _bwd)
