"""The full Point-NeRF forward pipeline: query -> gather -> aggregate -> march.

TPU-native equivalent of `NeuralPointsRayMarching.forward`
(models/neural_points_volumetric_model_ori.py:258-384) plus `fill_invalid`
(:90-129). Because we never compact rays to the dynamic hit count, the
"fill" of missed rays is automatic: their samples are fully masked, so the
march produces pure background — identical to fill_invalid's scatter.

Everything here is jit-compatible with static shapes; `render_rays` is the
single function the training step, the test renderer, and `__graft_entry__`
all jit.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..camera import w2pers
from ..config import PointNeRFConfig, effective_ray_generator as _effective_gen
from ..ops.grid import PointGrid
from ..ops.query import QueryResult, query_points
from .aggregator import aggregate
from .points import PointCloud, PointCloudStatic, gather_points
from .ray_march import BLEND_FUNCS, RENDER_FUNCS, TONEMAP_FUNCS, ray_march


class RayBatch(NamedTuple):
    """One training/test batch of rays (item dict keys,
    data/nerf_synth360_ft_dataset.py:546-647)."""
    campos: jnp.ndarray      # [3]
    camrotc2w: jnp.ndarray   # [3, 3]
    raydir: jnp.ndarray      # [R, 3]
    pixel_idx: jnp.ndarray   # [R, 2] int32
    near: jnp.ndarray        # [] float
    far: jnp.ndarray         # [] float
    gt_image: Optional[jnp.ndarray] = None  # [R, 3]


class RenderOutput(NamedTuple):
    coarse_raycolor: jnp.ndarray        # [R, C]
    coarse_is_background: jnp.ndarray   # [R, 1]
    coarse_depth: jnp.ndarray           # [R, 1] blend-weighted z depth
    coarse_point_opacity: jnp.ndarray   # [R, SR]
    queried_shading: jnp.ndarray        # [R, 1] 1 where ray found no shading
    ray_mask: jnp.ndarray               # [R] bool
    weight: jnp.ndarray                 # [R, SR, K]
    conf_coefficient: jnp.ndarray       # [R, SR, K]
    ray_valid: jnp.ndarray              # [R, SR] bool
    sample_loc_w: jnp.ndarray           # [R, SR, 3]
    # prob-mode probe outputs for point growing (_ori.py:351-383)
    ray_max_shading_opacity: Optional[jnp.ndarray] = None  # [R, 1]
    ray_max_sample_loc_w: Optional[jnp.ndarray] = None     # [R, 3]
    ray_max_far_dist: Optional[jnp.ndarray] = None         # [R, 1]
    shading_avg_color: Optional[jnp.ndarray] = None        # [R, 3]
    shading_avg_dir: Optional[jnp.ndarray] = None          # [R, 3]
    shading_avg_conf: Optional[jnp.ndarray] = None         # [R, 1]
    shading_avg_embedding: Optional[jnp.ndarray] = None    # [R, F]
    # hierarchical refinement output (fine_sample_num > 0): second pass over
    # importance-resampled shading points (refine_ray_generation semantics)
    fine_raycolor: Optional[jnp.ndarray] = None            # [R, C]


def compute_ray_dist(sample_loc_pers, ray_valid, vsize_z: float,
                     raydist_mode_unit: int):
    """Per-sample integration step from the cummax of perspective depth
    (_ori.py:296-304)."""
    z = sample_loc_pers[..., 2]
    zmax = jax.lax.cummax(z, axis=z.ndim - 1)
    ray_dist = jnp.concatenate(
        [zmax[..., 1:] - zmax[..., :-1],
         jnp.full(zmax.shape[:-1] + (1,), vsize_z, zmax.dtype)], axis=-1)
    bad = ray_dist < 1e-8
    if raydist_mode_unit > 0:
        bad = bad | (ray_dist > 2 * vsize_z)
    ray_dist = jnp.where(bad, vsize_z, ray_dist)
    return ray_dist * ray_valid.astype(ray_dist.dtype)


def shade(params: Dict, cfg: PointNeRFConfig, sp, sample_loc, sample_loc_w,
          sample_ray_dirs, Rw2c, prob: bool = False,
          compute_dtype=jnp.float32) -> RenderOutput:
    """Post-gather pipeline: aggregate -> ray_dist -> march -> tonemap.

    Shared by the single-chip path (render_rays) and the point-sharded path
    (parallel/sharded.py), which merges cross-shard KNN candidates before
    calling this. All inputs are per-(ray, sample[, neighbor]) tensors."""
    if cfg.train.compute_dtype == "bf16":
        compute_dtype = jnp.bfloat16

    def _agg(params, sp, sample_loc, sample_loc_w, sample_ray_dirs, Rw2c):
        return aggregate(params, cfg.agg, sp, sample_loc, sample_loc_w,
                         sample_ray_dirs, cfg.query.vsize, Rw2c=Rw2c,
                         compute_dtype=compute_dtype)

    if cfg.parallel.remat:
        _agg = jax.checkpoint(_agg)
    agg = _agg(params, sp, sample_loc, sample_loc_w, sample_ray_dirs, Rw2c)

    ray_dist = compute_ray_dist(sample_loc, agg.ray_valid,
                                cfg.query.vsize[2], cfg.render.raydist_mode_unit)

    render_func = RENDER_FUNCS[cfg.render.which_render_func]
    blend_func = BLEND_FUNCS[cfg.render.which_blend_func]
    tonemap = TONEMAP_FUNCS[cfg.render.which_tonemap_func]
    bg = jnp.asarray(cfg.render.bg_color, jnp.float32)
    if cfg.agg.shading_color_channel_num != 3:
        bg = jnp.zeros((cfg.agg.shading_color_channel_num,), jnp.float32)

    (ray_color, _point_color, opacity, acc_transmission, blend_w,
     background_transmission, _bg_bw) = ray_march(
        ray_dist, agg.ray_valid, agg.features, render_func, blend_func, bg)
    ray_color = tonemap(ray_color)

    # blend-weighted expected depth (perspective z of shading samples) —
    # feeds ray_depth_masked_* losses (base_rendering_model.py:565-571)
    depth = jnp.sum(blend_w[..., 0] * sample_loc[..., 2], axis=-1,
                    keepdims=True)

    queried_shading = (~jnp.any(agg.ray_valid, axis=-1, keepdims=True)).astype(jnp.float32)
    ray_mask = jnp.any(sp.mask.reshape(sp.mask.shape[0], -1), axis=-1)

    out = RenderOutput(
        coarse_raycolor=ray_color,
        coarse_is_background=background_transmission,
        coarse_depth=depth,
        coarse_point_opacity=opacity,
        queried_shading=queried_shading,
        ray_mask=ray_mask,
        weight=agg.weight,
        conf_coefficient=agg.conf_coefficient,
        ray_valid=agg.ray_valid,
        sample_loc_w=sample_loc_w,
    )

    if prob:
        # probe outputs used by point growing (_ori.py:351-372)
        op = opacity  # [R, SR]
        max_op = jnp.max(op, axis=-1, keepdims=True)             # [R,1]
        op_ind = jnp.argmax(op, axis=-1)                         # [R]
        r = jnp.arange(op.shape[0])
        loc_w = sample_loc_w[r, op_ind]                          # [R,3]
        wgt = (agg.weight * agg.conf_coefficient)[r, op_ind]     # [R,K]
        sxyz = sp.xyz[r, op_ind]                                 # [R,K,3]
        m = sp.mask[r, op_ind]                                   # [R,K]
        far = jnp.min(jnp.where(m, jnp.linalg.norm(sxyz - loc_w[:, None, :], axis=-1),
                                jnp.inf), axis=-1, keepdims=True)
        far = jnp.where(jnp.isfinite(far), far, 0.0)
        wk = wgt[..., None]
        out = out._replace(
            ray_max_shading_opacity=max_op,
            ray_max_sample_loc_w=loc_w,
            ray_max_far_dist=far,
            shading_avg_color=jnp.sum(sp.color[r, op_ind] * wk, axis=-2),
            shading_avg_dir=jnp.sum(sp.dirs[r, op_ind] * wk, axis=-2),
            shading_avg_conf=jnp.sum(sp.conf[r, op_ind] * wk, axis=-2),
            shading_avg_embedding=jnp.sum(sp.features[r, op_ind] * wk, axis=-2),
        )
    return out


def _shade_at(params, pc: PointCloud, st: PointCloudStatic, grid,
              batch: RayBatch, cfg: PointNeRFConfig, sample_loc_w,
              sample_mask, prob: bool, compute_dtype) -> RenderOutput:
    """KNN + gather + shade at explicit world shading locations (shared by
    the occupancy-selected coarse pass and the importance-resampled fine
    pass)."""
    from ..ops.query import knn_query
    sample_pidx, _d2 = knn_query(sample_loc_w, sample_mask, pc.xyz, grid,
                                 cfg.query)
    pnt_mask = sample_pidx >= 0
    sample_mask = sample_mask & jnp.any(pnt_mask, axis=-1)
    sample_loc_w = jnp.where(sample_mask[..., None], sample_loc_w, 0.0)

    xyz_pers = w2pers(pc.xyz, batch.camrotc2w, batch.campos)
    sp = gather_points(pc, xyz_pers, sample_pidx)
    sample_loc = w2pers(sample_loc_w, batch.camrotc2w, batch.campos)
    sample_loc = jnp.where(sample_mask[..., None], sample_loc, 0.0)
    sample_ray_dirs = jnp.broadcast_to(batch.raydir[:, None, :],
                                       sample_loc_w.shape)
    Rw2c = st.Rw2c
    if Rw2c.ndim == 3:
        Rw2c = Rw2c[jnp.maximum(sample_pidx, 0)]
    return shade(params, cfg, sp, sample_loc, sample_loc_w, sample_ray_dirs,
                 Rw2c, prob=prob, compute_dtype=compute_dtype)


def render_rays(params: Dict, pc: PointCloud, st: PointCloudStatic,
                grid: PointGrid, batch: RayBatch, cfg: PointNeRFConfig,
                key: Optional[jnp.ndarray] = None, train: bool = False,
                prob: bool = False,
                compute_dtype=jnp.float32) -> RenderOutput:
    """Render a batch of rays against the neural point cloud."""
    from ..config import generator_kwargs
    k_coarse = k_fine = None
    if key is not None:
        k_coarse, k_fine = jax.random.split(key)
    q: QueryResult = query_points(
        pc.xyz, grid, batch.campos, batch.raydir,
        float(cfg.render.near_plane), float(cfg.render.far_plane), cfg.query,
        jitter=cfg.render.train_jitter if train else 0.0, key=k_coarse,
        gen_name=_effective_gen(cfg), gen_kwargs=generator_kwargs(cfg))

    # Perspective coords of all points for this camera (neural_points.py:635).
    xyz_pers = w2pers(pc.xyz, batch.camrotc2w, batch.campos)
    sp = gather_points(pc, xyz_pers, q.sample_pidx)
    sample_loc = w2pers(q.sample_loc_w, batch.camrotc2w, batch.campos)
    sample_loc = jnp.where(q.sample_mask[..., None], sample_loc, 0.0)

    sample_ray_dirs = jnp.broadcast_to(batch.raydir[:, None, :],
                                       q.sample_loc_w.shape)
    Rw2c = st.Rw2c
    if Rw2c.ndim == 3:
        # per-point rotations (editing composites): gather per neighbor
        Rw2c = Rw2c[jnp.maximum(q.sample_pidx, 0)]      # [R,SR,K,3,3]
    out = shade(params, cfg, sp, sample_loc, q.sample_loc_w, sample_ray_dirs,
                Rw2c, prob=prob, compute_dtype=compute_dtype)

    if cfg.render.fine_sample_num > 0:
        # Hierarchical refinement (refine_ray_generation,
        # diff_ray_marching.py:396-433, wired here unlike the reference whose
        # fine_sample_num only ever registered loss names): importance-
        # resample shading locations from the coarse blend weights, re-query
        # KNN there, decode with the SAME aggregator, and expose
        # fine_raycolor for the loss/visuals.
        from ..ops.query import refine_ray_generation
        far = jnp.asarray(cfg.render.far_plane, jnp.float32)
        rd2 = jnp.sum(batch.raydir * batch.raydir, -1, keepdims=True)
        t = jnp.sum((q.sample_loc_w - batch.campos[None, None, :])
                    * batch.raydir[:, None, :], -1) / rd2          # [R,SR]
        t = jnp.where(q.sample_mask, t, far)
        # blend weights recomputed from the coarse opacities with the same
        # exclusive-cumprod transmission as ray_march
        alpha = out.coarse_point_opacity
        acc = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        acc = jnp.concatenate([jnp.ones_like(acc[:, :1]), acc[:, :-1]], -1)
        w = jnp.where(q.sample_mask, alpha * acc, 0.0)
        fine_pos, _seg, mid = refine_ray_generation(
            batch.campos, batch.raydir, cfg.render.fine_sample_num,
            jax.lax.stop_gradient(t), jax.lax.stop_gradient(w),
            jitter=cfg.render.train_jitter if train else 0.0, key=k_fine)
        fine_mask = jnp.broadcast_to(out.ray_mask[:, None], mid.shape)
        fine_out = _shade_at(params, pc, st, grid, batch, cfg, fine_pos,
                             fine_mask, prob=False,
                             compute_dtype=compute_dtype)
        out = out._replace(fine_raycolor=fine_out.coarse_raycolor)
    return out
