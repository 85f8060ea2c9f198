"""Voxel downsampling & segment reductions — torch_scatter replacement.

TPU-native equivalents of the reference's torch_scatter usage (SURVEY.md
§2.1 N3): `construct_vox_points_closest` (models/mvs/mvs_utils.py:537-562)
voxelizes a cloud at vox_res³ and keeps, per occupied voxel, the point
closest to the voxel's centroid (scatter_mean for centroids + scatter_min
for the representative). Here the same result comes from one sort by voxel
id + segment reductions — deterministic, no atomics, jit-compatible
(`jax.ops.segment_*` lower to sorted-segment ops on TPU).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def voxelize_ids(xyz: jnp.ndarray, vox_res: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flat voxel id per point at vox_res³ over the cloud AABB
    (mvs_utils.py:541-546 semantics: span/vox_res cell size)."""
    mn = jnp.min(xyz, axis=0)
    mx = jnp.max(xyz, axis=0)
    span = jnp.maximum(mx - mn, 1e-9)
    cell = span / vox_res
    c = jnp.clip(jnp.floor((xyz - mn) / cell).astype(jnp.int32), 0,
                 vox_res - 1)
    vid = (c[:, 0] * vox_res + c[:, 1]) * vox_res + c[:, 2]
    return vid, mn, cell


def construct_vox_points_closest(xyz: np.ndarray, vox_res: int
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Downsample: one representative point per occupied voxel — the point
    nearest the voxel centroid. Returns (indices into xyz [M], centroids
    [M,3]). Host-side wrapper (runs once at scene init, like the reference
    which calls it once per scene, run/train_ft.py:141-147)."""
    xyz_j = jnp.asarray(xyz, jnp.float32)
    vid, _mn, _cell = voxelize_ids(xyz_j, vox_res)
    vid = np.asarray(vid)
    order = np.argsort(vid, kind="stable")
    sv = vid[order]
    uniq, seg_start = np.unique(sv, return_index=True)
    seg_id = np.zeros(len(sv), np.int64)
    seg_id[seg_start[1:]] = 1
    seg_id = np.cumsum(seg_id)

    pts = np.asarray(xyz, np.float32)[order]
    m = len(uniq)
    sums = np.zeros((m, 3), np.float64)
    np.add.at(sums, seg_id, pts)
    counts = np.zeros((m,), np.int64)
    np.add.at(counts, seg_id, 1)
    centroids = (sums / counts[:, None]).astype(np.float32)

    d2 = np.sum((pts - centroids[seg_id]) ** 2, axis=-1)
    # per-segment argmin via lexsort on (segment, distance)
    best = np.zeros((m,), np.int64)
    rank = np.lexsort((d2, seg_id))
    first_of_seg = np.unique(seg_id[rank], return_index=True)[1]
    best = rank[first_of_seg]
    rep_idx = order[best]
    return rep_idx.astype(np.int64), centroids


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """scatter_mean equivalent (jit-compatible)."""
    s = jax.ops.segment_sum(data, segment_ids, num_segments)
    c = jax.ops.segment_sum(jnp.ones_like(segment_ids, jnp.float32),
                            segment_ids, num_segments)
    return s / jnp.clip(c[..., None] if data.ndim > 1 else c, min=1.0)


def segment_min_arg(values: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Index of the per-segment minimum (scatter_min's argmin output,
    mvs_utils.py:554-559). Invalid (empty) segments return 0."""
    order = jnp.lexsort((values, segment_ids))
    sseg = segment_ids[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sseg[1:] != sseg[:-1]])
    return jnp.zeros((num_segments,), jnp.int32).at[
        jnp.where(first, sseg, num_segments)].set(
        order.astype(jnp.int32), mode="drop")
