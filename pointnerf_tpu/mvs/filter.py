"""Cross-view geometric consistency filtering of MVS depth maps.

Reimplements models/mvs/filter_utils.py:130-291 (`reproject_with_depth_gpu`,
`check_geometric_consistency_gpu`, `filter_by_masks_gpu`): a ref-view depth
pixel survives if, reprojected into >= `geo_cnsst_num` source views and back,
it lands within 1px of where it started with <1% relative depth difference,
and its photometric confidence clears `depth_conf_thresh`. Fully vectorized
per view pair; the view loop is a host loop like the reference's (runs once
per scene at init).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sample2d import bilinear_sample


def reproject_with_depth(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """Project ref depth into src, sample src depth, project back.

    depth_*: [H, W]; K: [3,3] intrinsics; E: [4,4] world->cam extrinsics.
    Returns (depth_reprojected [H,W], x_rep [H,W], y_rep [H,W], oor_mask)."""
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # ref pixel -> ref cam -> world -> src cam -> src pixel
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=0).reshape(3, -1)
    cam_ref = jnp.linalg.inv(K_ref) @ (pix * depth_ref.reshape(1, -1))
    rel = E_src @ jnp.linalg.inv(E_ref)
    cam_src = rel[:3, :3] @ cam_ref + rel[:3, 3:4]
    z_src = cam_src[2]
    pix_src = K_src @ cam_src
    xs = pix_src[0] / jnp.maximum(pix_src[2], 1e-9)
    ys = pix_src[1] / jnp.maximum(pix_src[2], 1e-9)
    oor = (xs < 0) | (xs >= W) | (ys < 0) | (ys >= H) | (z_src <= 0)

    # sample the src depth at those locations
    d_src = bilinear_sample(depth_src[..., None], xs, ys)[..., 0]

    # src pixel + sampled depth -> world -> ref cam -> ref pixel
    cam_src2 = jnp.linalg.inv(K_src) @ (
        jnp.stack([xs, ys, jnp.ones_like(xs)], 0) * d_src.reshape(1, -1))
    rel_back = E_ref @ jnp.linalg.inv(E_src)
    cam_ref2 = rel_back[:3, :3] @ cam_src2 + rel_back[:3, 3:4]
    depth_rep = cam_ref2[2].reshape(H, W)
    pix_ref2 = K_ref @ cam_ref2
    x_rep = (pix_ref2[0] / jnp.maximum(pix_ref2[2], 1e-9)).reshape(H, W)
    y_rep = (pix_ref2[1] / jnp.maximum(pix_ref2[2], 1e-9)).reshape(H, W)
    return depth_rep, x_rep, y_rep, oor.reshape(H, W)


@jax.jit
def check_geometric_consistency(depth_ref, K_ref, E_ref,
                                depth_src, K_src, E_src):
    """(filter_utils.py:203-218). Returns (geo_mask, vis_mask,
    depth_reprojected)."""
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    depth_rep, x_rep, y_rep, oor = reproject_with_depth(
        depth_ref, K_ref, E_ref, depth_src, K_src, E_src)
    dist = jnp.sqrt((x_rep - x) ** 2 + (y_rep - y) ** 2)
    rel_diff = jnp.abs(depth_rep - depth_ref) / jnp.maximum(depth_ref, 1e-9)
    geo = (dist < 1.0) & (rel_diff < 0.01)
    depth_rep = jnp.where(geo, depth_rep, 0.0)
    return geo, ~oor, depth_rep


def filter_by_masks(depths: Sequence[np.ndarray], confs: Sequence[np.ndarray],
                    intrinsics: Sequence[np.ndarray],
                    extrinsics: Sequence[np.ndarray],
                    depth_conf_thresh: float = 0.8, geo_cnsst_num: int = 3,
                    masks: Optional[Sequence[np.ndarray]] = None
                    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Per ref view: averaged consistent depth + survivor mask
    (filter_utils.py:222-291). Returns (xyz_world per view [M,3],
    filtered confidence per view [M])."""
    V = len(depths)
    xyz_world_lst, conf_lst = [], []
    for ref in range(V):
        d_ref = jnp.asarray(depths[ref])
        H, W = d_ref.shape
        geo_sum = jnp.zeros((H, W), jnp.int32)
        depth_sum = jnp.zeros((H, W))
        for src in range(V):
            if src == ref:
                continue
            geo, _vis, d_rep = check_geometric_consistency(
                d_ref, jnp.asarray(intrinsics[ref]),
                jnp.asarray(extrinsics[ref]), jnp.asarray(depths[src]),
                jnp.asarray(intrinsics[src]), jnp.asarray(extrinsics[src]))
            geo_sum = geo_sum + geo.astype(jnp.int32)
            depth_sum = depth_sum + d_rep
        depth_avg = (depth_sum + d_ref) / (geo_sum + 1)
        final = jnp.asarray(confs[ref]) > depth_conf_thresh
        if masks is not None:
            final = final & jnp.asarray(masks[ref])
        if V > 1:
            final = final & (geo_sum >= geo_cnsst_num)

        final_np = np.asarray(final)
        ys, xs = np.nonzero(final_np)
        d = np.asarray(depth_avg)[ys, xs]
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=0).astype(np.float64)
        cam = np.linalg.inv(np.asarray(intrinsics[ref])) @ (pix * d)
        cam_h = np.concatenate([cam, np.ones((1, cam.shape[1]))], axis=0)
        world = (np.linalg.inv(np.asarray(extrinsics[ref])) @ cam_h)[:3].T
        xyz_world_lst.append(world.astype(np.float32))
        conf_lst.append(np.asarray(confs[ref])[ys, xs].astype(np.float32))
    return xyz_world_lst, conf_lst
