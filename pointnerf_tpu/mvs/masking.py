"""Visual-hull filtering and background-plane point generation.

Reimplements models/mvs/mvs_utils.py:
 - alpha_masking (:573-605): keep points whose projection lands on a
   non-transparent pixel in EVERY init view (visual hull from image alphas),
   optionally intersected with the camera-space near/far range.
 - gen_bg_points / get_rayplane_cross (:378-409): ray-plane intersections
   used to seed background-plane points for scenes with a ground/back plane
   (set_bg compositing, mvs_points_volumetric_model.py:279-317).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def alpha_masking(points: np.ndarray, alphas: Sequence[np.ndarray],
                  intrinsics: Sequence[np.ndarray],
                  w2cs: Sequence[np.ndarray],
                  near_far: Optional[Tuple[float, float]] = None,
                  alpha_thresh: float = 0.1,
                  keep_outside_view: bool = True) -> np.ndarray:
    """Returns a bool mask over points surviving the visual hull.

    points [N,3]; alphas: per-view [H,W] in [0,1]; keep_outside_view: points
    projecting outside an image count as visible in that view (reference
    range_mask handling when alpha_range>0)."""
    n = points.shape[0]
    keep = np.ones(n, bool)
    for alpha, K, w2c in zip(alphas, intrinsics, w2cs):
        H, W = alpha.shape
        xyz1 = np.concatenate([points, np.ones((n, 1), points.dtype)], -1)
        cam = (xyz1 @ np.asarray(w2c, points.dtype).T)[:, :3]
        view_ok = np.ones(n, bool)
        if near_far is not None:
            view_ok &= (cam[:, 2] >= near_far[0] - 1.0) & (cam[:, 2] <= near_far[1])
        pix = cam @ np.asarray(K, points.dtype).T
        with np.errstate(divide="ignore", invalid="ignore"):
            xy = np.floor(pix[:, :2] / pix[:, 2:3]).astype(np.int64)
        in_img = ((xy[:, 0] >= 0) & (xy[:, 0] < W)
                  & (xy[:, 1] >= 0) & (xy[:, 1] < H) & (cam[:, 2] > 0))
        xc = np.clip(xy[:, 0], 0, W - 1)
        yc = np.clip(xy[:, 1], 0, H - 1)
        a = np.asarray(alpha)[yc, xc]
        visible = a > alpha_thresh
        if keep_outside_view:
            visible |= ~in_img
        keep &= visible & view_ok
    return keep


def ray_plane_cross(campos, raydir, plane_pnt, plane_normal,
                    epsilon: float = 1e-3):
    """Ray/plane intersections (get_rayplane_cross, mvs_utils.py:385-409).

    campos [3]; raydir [R,3]; returns (points [R,3], valid [R]) — rays near
    parallel to the plane (|dot| < eps) are invalid and return zeros."""
    dot = jnp.sum(plane_normal[None] * raydir, axis=-1)        # [R]
    valid = dot >= epsilon
    w = campos[None] - plane_pnt[None]
    fac = -jnp.sum(plane_normal[None] * w, axis=-1) / jnp.where(valid, dot, 1.0)
    pts = campos[None] + raydir * fac[:, None]
    return jnp.where(valid[:, None], pts, 0.0), valid


def gen_bg_points(campos, raydir, plane_pnt, plane_normal):
    """Background-plane points for a ray batch (gen_bg_points :378-383)."""
    pts, valid = ray_plane_cross(jnp.asarray(campos), jnp.asarray(raydir),
                                 jnp.asarray(plane_pnt),
                                 jnp.asarray(plane_normal))
    return pts, valid
