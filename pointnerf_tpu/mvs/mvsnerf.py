"""MVSNeRF-style volumetric rendering from a regularized cost volume.

Compact reimplementation of the reference's MVSNeRF stack
(models/mvs/models.py:148-570 `Renderer_ours`/`MVSNeRF` + renderer.py:66-183
`raw2outputs`/`rendering`): rays are marched through the reference-view
frustum, per-sample features are trilinearly interpolated from the 3D
neuralized cost volume (NDC-aligned) and concatenated with source-image
colors sampled at the projections; a small MLP decodes density + radiance,
composited with the shared ray-march core. Used by the generalization mode
0/1 paths as the volume-rendering branch alongside the point branch.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.ray_march import alpha_blend, radiance_render, ray_march
from ..ops.pe import positional_encoding
from ..ops.sample2d import bilinear_sample


def trilinear_sample_volume(vol: jnp.ndarray, ndc: jnp.ndarray) -> jnp.ndarray:
    """vol: [D, H, W, C]; ndc: [..., 3] in [0,1]³ (x->W, y->H, z->D).
    Zero padding outside. Returns [..., C]."""
    D, H, W, C = vol.shape
    x = ndc[..., 0] * (W - 1)
    y = ndc[..., 1] * (H - 1)
    z = ndc[..., 2] * (D - 1)

    def tap(zi, yi, xi):
        inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
               & (zi >= 0) & (zi < D))
        v = vol[jnp.clip(zi, 0, D - 1), jnp.clip(yi, 0, H - 1),
                jnp.clip(xi, 0, W - 1)]
        return v * inb[..., None]

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    tx, ty, tz = (x - x0)[..., None], (y - y0)[..., None], (z - z0)[..., None]
    x0i, y0i, z0i = (x0.astype(jnp.int32), y0.astype(jnp.int32),
                     z0.astype(jnp.int32))
    c00 = tap(z0i, y0i, x0i) * (1 - tx) + tap(z0i, y0i, x0i + 1) * tx
    c01 = tap(z0i, y0i + 1, x0i) * (1 - tx) + tap(z0i, y0i + 1, x0i + 1) * tx
    c10 = tap(z0i + 1, y0i, x0i) * (1 - tx) + tap(z0i + 1, y0i, x0i + 1) * tx
    c11 = (tap(z0i + 1, y0i + 1, x0i) * (1 - tx)
           + tap(z0i + 1, y0i + 1, x0i + 1) * tx)
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


class MVSNeRFDecoder(nn.Module):
    """Renderer_ours-style MLP (models.py:148-247): PE(xyz) + PE(dir) +
    volume features + source colors -> (sigma, rgb)."""
    depth: int = 6
    width: int = 128
    skips: Tuple[int, ...] = (4,)
    pos_freqs: int = 10
    dir_freqs: int = 4

    @nn.compact
    def __call__(self, xyz, viewdirs, feat):
        """xyz, viewdirs: [..., 3]; feat: [..., F]. Returns [..., 4]
        (sigma ++ rgb)."""
        p = positional_encoding(xyz, self.pos_freqs, ori=True)
        d = positional_encoding(viewdirs, self.dir_freqs, ori=True)
        h = jnp.concatenate([p, feat], axis=-1)
        inp = h
        for i in range(self.depth):
            h = nn.relu(nn.Dense(self.width)(h))
            if i in self.skips:
                h = jnp.concatenate([inp, h], axis=-1)
        sigma = nn.Dense(1)(h)
        bottleneck = nn.Dense(self.width)(h)
        h2 = nn.relu(nn.Dense(self.width // 2)(
            jnp.concatenate([bottleneck, d], axis=-1)))
        rgb = nn.Dense(3)(h2)
        return jnp.concatenate([nn.relu(sigma), nn.sigmoid(rgb)], axis=-1)


def world_to_ref_ndc(xyz_w, w2c_ref, K_ref, near: float, far: float,
                     W: int, H: int):
    """World points -> reference-frustum NDC in [0,1]³ (get_ndc_coordinate,
    mvs_utils.py:101-135)."""
    ones = jnp.ones_like(xyz_w[..., :1])
    cam = (jnp.concatenate([xyz_w, ones], -1) @ w2c_ref.T)[..., :3]
    pix = cam @ K_ref.T
    x = pix[..., 0] / jnp.maximum(pix[..., 2], 1e-9) / (W - 1)
    y = pix[..., 1] / jnp.maximum(pix[..., 2], 1e-9) / (H - 1)
    z = (cam[..., 2] - near) / (far - near)
    return jnp.stack([x, y, z], axis=-1)


def render_mvsnerf(decoder_params, decoder: MVSNeRFDecoder,
                   volume: jnp.ndarray, images: jnp.ndarray,
                   Ks: jnp.ndarray, w2cs: jnp.ndarray,
                   campos, raydir, near: float, far: float,
                   n_samples: int = 64,
                   bg_color: Optional[jnp.ndarray] = None,
                   key=None):
    """March rays through the volume (renderer.py `rendering`:139-183).

    volume [D,h,w,C] (neuralized cost volume at 1/4 res, ref view 0);
    images [V,H,W,3]; raydir [R,3]. Returns (rgb [R,3], depth [R],
    weights [R,S])."""
    V, H, W, _ = images.shape
    R = raydir.shape[0]
    t = jnp.linspace(0.0, 1.0, n_samples)
    tvals = near * (1 - t) + far * t                     # [S]
    if key is not None:
        mids = 0.5 * (tvals[1:] + tvals[:-1])
        upper = jnp.concatenate([mids, tvals[-1:]])
        lower = jnp.concatenate([tvals[:1], mids])
        u = jax.random.uniform(key, (R, n_samples))
        tvals = lower[None] + (upper - lower)[None] * u  # [R,S]
    else:
        tvals = jnp.broadcast_to(tvals[None], (R, n_samples))
    xyz = campos[None, None] + raydir[:, None] * tvals[..., None]

    ndc = world_to_ref_ndc(xyz, w2cs[0], Ks[0], near, far, W, H)
    feat_vol = trilinear_sample_volume(volume, ndc)       # [R,S,C]

    # source-image colors at the projections (build_color_volume analog)
    cols = []
    for v in range(V):
        ones = jnp.ones_like(xyz[..., :1])
        cam = (jnp.concatenate([xyz, ones], -1) @ w2cs[v].T)[..., :3]
        z = jnp.maximum(cam[..., 2], 1e-6)
        pix = cam @ Ks[v].T
        cols.append(bilinear_sample(images[v], pix[..., 0] / z,
                                    pix[..., 1] / z))
    feat = jnp.concatenate([feat_vol] + cols, axis=-1)

    dirs = jnp.broadcast_to(raydir[:, None, :], xyz.shape)
    raw = decoder.apply({"params": decoder_params}, xyz, dirs, feat)

    dists = jnp.diff(tvals, axis=-1,
                     append=tvals[..., -1:] + (far - near) / n_samples)
    dists = dists * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    valid = jnp.ones(raw.shape[:-1], bool)
    (rgb, _pc, opacity, _acc, blend_w, bgT, _bgw) = ray_march(
        dists, valid, raw, radiance_render, alpha_blend, bg_color)
    depth = jnp.sum(blend_w[..., 0] * tvals, axis=-1)
    return rgb, depth, blend_w[..., 0]
