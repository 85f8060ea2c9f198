"""Differentiable ray marching + render/blend/tonemap registries.

reference: models/rendering/diff_ray_marching.py:509-573 (ray_march,
alpha_ray_march) and models/rendering/diff_render_func.py:8-68.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


# ---- render functions (diff_render_func.py:48-55) -------------------------

def radiance_render(ray_feature):
    return ray_feature[..., 1:]


def white_color(ray_feature):
    albedo = jnp.clip(ray_feature[..., 1:4], 0.0, 1.0)
    return jnp.ones_like(albedo)


RENDER_FUNCS: Dict[str, Callable] = {"radiance": radiance_render, "white": white_color}


# ---- blend functions (diff_render_func.py:36-45) --------------------------

def alpha_blend(opacity, acc_transmission):
    return opacity * acc_transmission


def alpha2_blend(opacity, acc_transmission):
    return opacity * acc_transmission * acc_transmission


BLEND_FUNCS: Dict[str, Callable] = {"alpha": alpha_blend, "alpha2": alpha2_blend}


# ---- tone maps (diff_render_func.py:58-68) --------------------------------

def simple_tone_map(color, gamma=2.2, exposure=1.0):
    return jnp.clip(jnp.power(color * exposure + 1e-5, 1.0 / gamma), 0.0, 1.0)


def no_tone_map(color):
    return color


def normalize_tone_map(color):
    color = color / jnp.clip(jnp.linalg.norm(color, axis=-1, keepdims=True), min=1e-12)
    return color * 0.5 + 0.5


TONEMAP_FUNCS: Dict[str, Callable] = {
    "gamma": simple_tone_map, "off": no_tone_map, "normalize": normalize_tone_map}


# ---- ray march ------------------------------------------------------------

def ray_march(ray_dist, ray_valid, ray_features, render_func, blend_func,
              bg_color: Optional[jnp.ndarray] = None):
    """Alpha-composite decoded features along each ray.

    ray_dist: [R, SR]; ray_valid: [R, SR] bool; ray_features: [R, SR, 1+C].
    Matches diff_ray_marching.py:509-555 (batch dim dropped — vmap for B>1):
    opacity = 1 - exp(-sigma * dist); exclusive cumprod transmission; bg
    composited with the residual transmission.
    """
    point_color = render_func(ray_features)
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)

    acc = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = acc[..., -1:]
    acc = jnp.concatenate([jnp.ones_like(acc[..., :1]), acc[..., :-1]], axis=-1)

    blend_weight = blend_func(opacity, acc)[..., None]
    ray_color = jnp.sum(point_color * blend_weight, axis=-2)
    if bg_color is not None:
        ray_color = ray_color + bg_color.reshape(1, -1) * background_transmission
    background_blend_weight = blend_func(1.0, background_transmission)
    return (ray_color, point_color, opacity, acc, blend_weight,
            background_transmission, background_blend_weight)


def alpha_ray_march(ray_dist, ray_valid, ray_features, blend_func):
    """diff_ray_marching.py:558-573."""
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)
    acc = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = acc[..., -1:]
    acc = jnp.concatenate([jnp.ones_like(acc[..., :1]), acc[..., :-1]], axis=-1)
    blend_weight = blend_func(opacity, acc)[..., None]
    background_blend_weight = blend_func(1.0, background_transmission)
    return opacity, acc, blend_weight, background_transmission, background_blend_weight
