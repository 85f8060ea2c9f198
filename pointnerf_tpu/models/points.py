"""The neural point cloud: positions + per-point payloads, as a JAX pytree.

TPU-native redesign of `NeuralPoints` (models/neural_points/neural_points.py:11-812).
The reference stores each attribute as an nn.Parameter and mutates shapes on
prune/grow (restarting the process to rebuild optimizers, lego.sh:163,
run/train_ft.py:918). Here the cloud is an immutable pytree padded to a fixed
capacity bucket: `num_active` points are live, the tail is dead padding with
conf=0 and xyz parked outside the scene AABB so the voxel grid never indexes
it. Prune/grow re-pack in place (or re-bucket to the next power-of-two
capacity), so jit caches survive and no process restart is needed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PointsConfig

# Dead points are parked here — far outside any scene AABB so voxel hashing
# drops them (grid.build_grid also masks by num_active; this is belt&braces).
DEAD_XYZ = 1.0e8


class PointCloud(NamedTuple):
    """Trainable point payloads (leaves participate in autodiff; grad masking
    per attribute happens in the optimizer, see train/optim.py)."""
    xyz: jnp.ndarray        # [N, 3]
    features: jnp.ndarray   # [N, F]  (points_embeding, neural_points.py:232)
    conf: jnp.ndarray       # [N, 1]  (points_conf)
    color: jnp.ndarray      # [N, 3]  (points_color)
    dirs: jnp.ndarray       # [N, 3]  (points_dir)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


class PointCloudStatic(NamedTuple):
    """Non-trainable companion state."""
    num_active: jnp.ndarray  # [] int32
    Rw2c: jnp.ndarray        # [3, 3] global rotation (per-point variant: [N,3,3])


def round_capacity(n: int, multiple: int = 4096) -> int:
    """Bucket capacity so prune/grow re-jits only on bucket change."""
    return max(multiple, -(-n // multiple) * multiple)


def make_point_cloud(xyz: np.ndarray, key, cfg: PointsConfig,
                     feature_dim: int, features: Optional[np.ndarray] = None,
                     color: Optional[np.ndarray] = None,
                     dirs: Optional[np.ndarray] = None,
                     conf: Optional[np.ndarray] = None,
                     capacity: Optional[int] = None):
    """Build a padded PointCloud from raw arrays.

    feature init follows the reference 'rand' path (neural_points.py:241-314 /
    run/train_ft.py:738-741: uniform in [-1e-4? ...]). The reference uses
    `torch.rand` scaled — we use uniform(0,1)*1e-2 matching train_ft.py:740
    (`torch.rand(..) * 0.01` random embeddings) when features are not given.
    """
    n = xyz.shape[0]
    cap = capacity or round_capacity(n)
    kf, = jax.random.split(key, 1)

    def pad(a, fill=0.0):
        out = np.full((cap, a.shape[1]), fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    xyz_p = np.full((cap, 3), DEAD_XYZ, np.float32)
    xyz_p[:n] = xyz
    if features is None:
        if cfg.feature_init_method == "zeros":
            features = np.zeros((n, feature_dim), np.float32)
        else:  # 'rand' — torch.rand(..)*0.01 (run/train_ft.py:740)
            features = np.asarray(
                jax.random.uniform(kf, (n, feature_dim), jnp.float32) * 0.01)
    if conf is None:
        conf = np.full((n, 1), cfg.default_conf, np.float32)
    if color is None:
        color = np.zeros((n, 3), np.float32)
    if dirs is None:
        dirs = np.zeros((n, 3), np.float32)

    pc = PointCloud(xyz=jnp.asarray(xyz_p), features=pad(features),
                    conf=pad(conf), color=pad(color), dirs=pad(dirs))
    st = PointCloudStatic(num_active=jnp.asarray(n, jnp.int32),
                          Rw2c=jnp.eye(3, dtype=jnp.float32))
    return pc, st


class SampledPoints(NamedTuple):
    """Per-(ray, shading point, neighbor) gathered payloads."""
    xyz: jnp.ndarray        # [R, SR, K, 3]
    xyz_pers: jnp.ndarray   # [R, SR, K, 3]
    features: jnp.ndarray   # [R, SR, K, F]
    conf: jnp.ndarray       # [R, SR, K, 1]
    color: jnp.ndarray      # [R, SR, K, 3]
    dirs: jnp.ndarray       # [R, SR, K, 3]
    mask: jnp.ndarray       # [R, SR, K] bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _table_gather_sortbwd(table: jnp.ndarray, idx: jnp.ndarray,
                          _tag: str = "sort") -> jnp.ndarray:
    """table[idx] whose backward avoids a duplicate-index scatter-add.

    XLA lowers a scatter-add with colliding indices (every point is hit by
    many (ray, shading, K) lanes) into a serialized update loop on TPU. The
    custom backward instead argsorts the flat cotangent rows by point id and
    runs a sorted segment_sum — one linear pass, bitwise-deterministic, same
    gradient as the scatter up to f32 summation order."""
    return table[idx]


def _table_gather_sortbwd_fwd(table, idx, _tag):
    return table[idx], (idx, table.shape[0])


def _table_gather_sortbwd_bwd(_tag, res, ct):
    idx, n = res
    w = ct.shape[-1]
    ids = idx.reshape(-1)
    ctf = ct.reshape(-1, w)
    order = jnp.argsort(ids)
    g = jax.ops.segment_sum(ctf[order], ids[order], num_segments=n,
                            indices_are_sorted=True)
    return (g.astype(ct.dtype), None)


_table_gather_sortbwd.defvjp(_table_gather_sortbwd_fwd,
                             _table_gather_sortbwd_bwd)


def gather_points(pc: PointCloud, xyz_pers: jnp.ndarray,
                  sample_pidx: jnp.ndarray,
                  bwd: str = "scatter") -> SampledPoints:
    """Gather neighbor payloads (NeuralPoints.forward, neural_points.py:782-812).

    xyz_pers: [N, 3] perspective coords of all points for the current camera
    (computed once per view like point_xyz_pers_tensor, :635).
    sample_pidx: [R, SR, K] (-1 invalid; invalid gathers clamp to 0 and are
    masked downstream, matching torch.clamp(sample_pidx, min=0) :790).

    All payloads ride ONE concatenated table: on TPU a [R*SR*K]-indexed
    gather costs roughly the same regardless of row width, so one 45-wide
    gather (and its single backward scatter-add) replaces six narrow ones —
    a large fraction of the step on profile.

    bwd: QueryConfig.gather_bwd — "scatter" (XLA scatter-add) or "sort"
    (argsort + sorted segment_sum backward, _table_gather_sortbwd)."""
    mask = sample_pidx >= 0
    idx = jnp.maximum(sample_pidx, 0)
    F = pc.features.shape[-1]
    table = jnp.concatenate(
        [pc.xyz, xyz_pers, pc.features, pc.conf, pc.color, pc.dirs], axis=-1)
    if bwd == "sort":
        rows = _table_gather_sortbwd(table, idx)         # [R,SR,K, 13+F]
    else:
        rows = table[idx]                                # [R,SR,K, 13+F]
    o = 0

    def take(n):
        nonlocal o
        out = rows[..., o:o + n]
        o += n
        return out
    return SampledPoints(
        xyz=take(3), xyz_pers=take(3), features=take(F),
        conf=take(1), color=take(3), dirs=take(3), mask=mask)


def prune(pc: PointCloud, st: PointCloudStatic, thresh: float,
          return_order: bool = False,
          protect: Optional[jnp.ndarray] = None):
    """Drop points with conf <= thresh (NeuralPoints.prune, :350-373), packing
    survivors to the front of the same capacity bucket. Returns new
    (pc, st, kept_count[, pack_order]) — the pack order lets callers permute
    per-point optimizer moments along with the points (the reference instead
    rebuilds its optimizers, losing all Adam state).

    protect: optional [capacity] bool — points exempt from the confidence
    test (TrainConfig.prune_min_hits: under-hit points are under-TRAINED,
    not misplaced; the reference's global threshold deletes thin geometry
    on scaled-down schedules — PERF.md cluster failure analysis)."""
    n = pc.capacity
    alive = (jnp.arange(n) < st.num_active) & (pc.conf[:, 0] > thresh)
    if protect is not None:
        alive = alive | ((jnp.arange(n) < st.num_active) & protect)
    order = jnp.argsort(~alive, stable=True)  # survivors first, stable
    kept = jnp.sum(alive.astype(jnp.int32))

    def pack(a, fill):
        out = a[order]
        dead = jnp.arange(n)[:, None] >= kept
        return jnp.where(dead, fill, out)

    pc2 = PointCloud(
        xyz=pack(pc.xyz, DEAD_XYZ), features=pack(pc.features, 0.0),
        conf=pack(pc.conf, 0.0), color=pack(pc.color, 0.0),
        dirs=pack(pc.dirs, 0.0))
    if return_order:
        return pc2, st._replace(num_active=kept), kept, order
    return pc2, st._replace(num_active=kept), kept


def grow(pc: PointCloud, st: PointCloudStatic, new_xyz, new_features, new_conf,
         new_color, new_dirs):
    """Append grown points (NeuralPoints.grow_points, :376-402) into the
    padding tail. Caller must ensure capacity (re-bucket first if needed);
    overflow beyond capacity is dropped.

    new_* are [M, ...] arrays with a validity convention: rows of new_xyz equal
    to DEAD_XYZ are ignored (static-shape growing: M is the probe budget, the
    actual number of new points is dynamic).
    """
    n = pc.capacity
    m = new_xyz.shape[0]
    new_ok = new_xyz[:, 0] < DEAD_XYZ / 2
    new_rank = jnp.cumsum(new_ok.astype(jnp.int32)) - 1
    dst = jnp.where(new_ok, st.num_active + new_rank, n)  # n -> dropped

    def app(a, na):
        return a.at[dst].set(na, mode="drop")

    pc2 = PointCloud(
        xyz=app(pc.xyz, new_xyz), features=app(pc.features, new_features),
        conf=app(pc.conf, new_conf), color=app(pc.color, new_color),
        dirs=app(pc.dirs, new_dirs))
    added = jnp.minimum(jnp.sum(new_ok.astype(jnp.int32)),
                        n - st.num_active)
    return pc2, st._replace(num_active=st.num_active + added), added
