"""Pure-numpy oracles reproducing the reference CUDA/torch semantics.

These are direct, slow re-statements of the algorithms in
/root/reference/models/neural_points/query_point_indices_worldcoords.py and
models/rendering/diff_ray_marching.py, used as golden references for the
vectorized TPU implementations.
"""
from __future__ import annotations

import numpy as np


def oracle_voxel_coords(xyz, lo, vsize):
    return np.floor((xyz - np.asarray(lo)) / np.asarray(vsize)).astype(np.int32)


def oracle_build_grid(xyz, lo, vsize, vdim, max_o, P, query_size):
    """claim_occ + map_coor2occ + fill_occ2pnts semantics, deterministic
    ordering (voxels in voxel-id order, points in index order)."""
    n = xyz.shape[0]
    coor = oracle_voxel_coords(xyz, lo, vsize)
    inb = np.all((coor >= 0) & (coor < np.asarray(vdim)), axis=-1)
    gx, gy, gz = vdim
    vid = coor[:, 0] * gy * gz + coor[:, 1] * gz + coor[:, 2]

    # occupied voxels in ascending voxel-id order, capped at max_o
    occ_vids = np.unique(vid[inb])
    occ_vids = occ_vids[:max_o]
    slot_of = {v: i for i, v in enumerate(occ_vids)}

    bucket = [[] for _ in occ_vids]
    for i in range(n):
        if inb[i] and vid[i] in slot_of:
            b = bucket[slot_of[vid[i]]]
            if len(b) < P:
                b.append(i)

    occ = np.zeros(vdim, dtype=np.int8)
    for v in occ_vids:
        c = np.array([v // (gy * gz), (v // gz) % gy, v % gz])
        for ox in range(-(query_size[0] // 2), (query_size[0] + 1) // 2):
            for oy in range(-(query_size[1] // 2), (query_size[1] + 1) // 2):
                for oz in range(-(query_size[2] // 2), (query_size[2] + 1) // 2):
                    q = c + np.array([ox, oy, oz])
                    if np.all(q >= 0) and np.all(q < np.asarray(vdim)):
                        occ[tuple(q)] = 1
    return occ, occ_vids, bucket


def oracle_knn(center, xyz, lo, vsize, vdim, occ_vids, bucket, K, P,
               kernel_size, radius_limit2, shell_layered=True):
    """query_neigh_along_ray_layered semantics for one shading point.
    Returns the sorted list of kept squared distances."""
    slot_of = {v: i for i, v in enumerate(occ_vids)}
    gx, gy, gz = vdim
    c = oracle_voxel_coords(center[None], lo, vsize)[0]
    n_layers = (kernel_size[0] + 1) // 2

    kept = []  # list of d2, max-heap semantics via simple list
    kid = 0
    for layer in range(n_layers):
        for ox in range(-layer, layer + 1):
            for oy in range(-layer, layer + 1):
                for oz in range(-layer, layer + 1):
                    if max(abs(ox), abs(oy), abs(oz)) != layer:
                        continue
                    q = c + np.array([ox, oy, oz])
                    if not (np.all(q >= 0) and np.all(q < np.asarray(vdim))):
                        continue
                    v = q[0] * gy * gz + q[1] * gz + q[2]
                    if v not in slot_of:
                        continue
                    for pid in bucket[slot_of[v]][:P]:
                        d2 = float(np.sum((xyz[pid] - center) ** 2))
                        if radius_limit2 == 0 or d2 <= radius_limit2:
                            kid += 1
                            if len(kept) < K:
                                kept.append(d2)
                            elif d2 < max(kept):
                                kept[int(np.argmax(kept))] = d2
        if shell_layered and kid >= K:
            break
    return sorted(kept)


def oracle_ray_march(ray_dist, ray_valid, ray_features, bg_color=None):
    """diff_ray_marching.py:509-555 for a [R, SR, 1+C] batch."""
    sigma = ray_features[..., 0] * ray_valid.astype(np.float32)
    opacity = 1.0 - np.exp(-sigma * ray_dist)
    acc = np.cumprod(1.0 - opacity + 1e-10, axis=-1)
    bg_T = acc[..., -1:]
    acc = np.concatenate([np.ones_like(acc[..., :1]), acc[..., :-1]], axis=-1)
    blend = (opacity * acc)[..., None]
    color = ray_features[..., 1:]
    ray_color = np.sum(color * blend, axis=-2)
    if bg_color is not None:
        ray_color = ray_color + np.asarray(bg_color)[None] * bg_T
    return ray_color, opacity, acc, bg_T


def oracle_positional_encoding(x, freqs, ori=False):
    """helpers/networks.py:175-190."""
    fb = 2.0 ** np.arange(freqs)
    base = (x[..., None] * fb).reshape(x.shape[:-1] + (x.shape[-1] * freqs,))
    if ori:
        return np.concatenate([x, np.sin(base), np.cos(base)], axis=-1)
    inter = np.stack([np.sin(base), np.cos(base)], axis=-1)
    return inter.reshape(x.shape[:-1] + (x.shape[-1] * freqs * 2,))
