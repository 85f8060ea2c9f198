"""Bilinear 2D image sampling at continuous pixel coordinates.

JAX replacement for the reference's torch.nn.functional.grid_sample uses
(models/depth_estimators/module.py:66-70 homo_warping,
models/mvs/mvs_utils.py extract_from_2d_grid): gathers with zero padding
outside the image, fully vectorized — XLA lowers the 4 corner gathers +
lerp into fused gathers, no scalar loops.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """img: [H, W, C]; x, y: [...] pixel coords (x→W, y→H).
    Returns [..., C]; zero outside [0, W-1] x [0, H-1]."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return v * inb[..., None]

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def grid_sample_norm(img: jnp.ndarray, grid_xy: jnp.ndarray,
                     align_corners: bool = True) -> jnp.ndarray:
    """torch-style normalized-grid sampling. img [H,W,C]; grid_xy [...,2] in
    [-1,1]. align_corners=True matches the MVSNet homography normalization
    (module.py:61-62: x/( (W-1)/2 ) - 1)."""
    H, W = img.shape[0], img.shape[1]
    gx, gy = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return bilinear_sample(img, x, y)
