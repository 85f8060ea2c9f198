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
import numpy as np

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
    # valid sample slots dropped by the static-capacity compacted decode
    # (QueryConfig.decode_capacity); None on the dense path
    decode_dropped: Optional[jnp.ndarray] = None  # [] int32
    # neighbor point ids of the coarse decode (-1 invalid; [C,K] on the
    # compacted path, [R,SR,K] dense) — feeds the per-point hit counters
    # (TrainConfig.hit_lr_boost / prune_min_hits). None on the sharded path
    # (ids are shard-local there).
    neighbor_pidx: Optional[jnp.ndarray] = None
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
    # neighbor ids of the fine decode (same convention as neighbor_pidx)
    fine_neighbor_pidx: Optional[jnp.ndarray] = None
    # per-sample decoded features [R, SR, 1+C], kept only when the
    # proposal-NeRF hybrid needs to z-merge them with radiance-field
    # samples (RenderConfig.nerf_importance > 0)
    sample_features: Optional[jnp.ndarray] = None
    # coarse radiance-field color of the hybrid's proposal pass (reference
    # output 'nerf_coarse_raycolor', multiseq_model.py:336)
    nerf_coarse_raycolor: Optional[jnp.ndarray] = None
    # NeRF-driven point creation signals (reference --nerf_create_points,
    # multiseq_model.py:413-417): per-ray blend-weight mass carried by the
    # FIELD samples in the merged march, their expected world location, and
    # expected color — probe_hole turns confident masses on missed rays
    # into grow candidates (TrainConfig.nerf_create_points)
    nerf_mass: Optional[jnp.ndarray] = None      # [R, 1]
    nerf_loc_w: Optional[jnp.ndarray] = None     # [R, 3]
    nerf_color: Optional[jnp.ndarray] = None     # [R, 3]


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


def _finalize(cfg: PointNeRFConfig, features, ray_valid, weight, conf_coeff,
              sample_loc, sample_loc_w, ray_mask,
              decode_dropped=None, train: bool = False) -> RenderOutput:
    """March + tonemap + output assembly over per-(ray, sample) decoded
    features [R, SR, 1+C] (shared by the dense and compacted decode paths)."""
    ray_dist = compute_ray_dist(sample_loc, ray_valid,
                                cfg.query.vsize[2], cfg.render.raydist_mode_unit)

    render_func = RENDER_FUNCS[cfg.render.which_render_func]
    blend_func = BLEND_FUNCS[cfg.render.which_blend_func]
    tonemap = TONEMAP_FUNCS[cfg.render.which_tonemap_func]
    bg = jnp.asarray(cfg.render.bg_color, jnp.float32)
    if cfg.agg.shading_color_channel_num != 3:
        bg = jnp.zeros((cfg.agg.shading_color_channel_num,), jnp.float32)

    # The fused compositor accelerates INFERENCE only: its custom_vjp
    # backward recomputes through the XLA path, so under a grad trace the
    # kernel would be pure overhead — training steps take the XLA march.
    if cfg.render.fused_march and not train:
        if (cfg.render.which_render_func != "radiance"
                or cfg.render.which_blend_func != "alpha"):
            raise ValueError(
                "render.fused_march supports only which_render_func="
                "'radiance' + which_blend_func='alpha'; got "
                f"{cfg.render.which_render_func!r}/"
                f"{cfg.render.which_blend_func!r}")
        # single-pass Pallas compositor: transmission carried in VMEM
        # registers, no materialized [R,SR,C] point_color / weighted
        # product (backward recomputes through the XLA path — see
        # ops/pallas_march.py)
        from ..ops.pallas_march import pallas_ray_march
        ray_color, opacity, background_transmission = pallas_ray_march(
            ray_dist, ray_valid, features, bg)
        # blend weights only feed the expected-depth reduction below:
        # cheap [R,SR] elementwise recompute from the kernel's opacity
        acc = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
        acc = jnp.concatenate([jnp.ones_like(acc[..., :1]),
                               acc[..., :-1]], -1)
        blend_w = (opacity * acc)[..., None]
    else:
        (ray_color, _point_color, opacity, _acc_transmission, blend_w,
         background_transmission, _bg_bw) = ray_march(
            ray_dist, ray_valid, features, render_func, blend_func, bg)
    ray_color = tonemap(ray_color)

    # blend-weighted expected depth (perspective z of shading samples) —
    # feeds ray_depth_masked_* losses (base_rendering_model.py:565-571)
    depth = jnp.sum(blend_w[..., 0] * sample_loc[..., 2], axis=-1,
                    keepdims=True)

    queried_shading = (~jnp.any(ray_valid, axis=-1, keepdims=True)).astype(jnp.float32)
    return RenderOutput(
        coarse_raycolor=ray_color,
        coarse_is_background=background_transmission,
        coarse_depth=depth,
        coarse_point_opacity=opacity,
        queried_shading=queried_shading,
        ray_mask=ray_mask,
        weight=weight,
        conf_coefficient=conf_coeff,
        ray_valid=ray_valid,
        sample_loc_w=sample_loc_w,
        decode_dropped=decode_dropped,
        sample_features=(features if cfg.render.nerf_importance > 0
                         else None),
    )


def shade(params: Dict, cfg: PointNeRFConfig, sp, sample_loc, sample_loc_w,
          sample_ray_dirs, Rw2c, prob: bool = False,
          compute_dtype=jnp.float32, train: bool = False) -> RenderOutput:
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

    ray_mask = jnp.any(sp.mask.reshape(sp.mask.shape[0], -1), axis=-1)
    out = _finalize(cfg, agg.features, agg.ray_valid, agg.weight,
                    agg.conf_coefficient, sample_loc, sample_loc_w, ray_mask,
                    train=train)

    if prob:
        # probe outputs used by point growing (_ori.py:351-372)
        op = out.coarse_point_opacity  # [R, SR]
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


def decode_slots(cfg: PointNeRFConfig, rs: int) -> int:
    """Static compact-decode capacity for `rs` dense sample slots (rounded up
    to 512 for clean MXU/VPU tiling, clamped to the dense extent)."""
    c = int(round(cfg.query.decode_capacity * rs))
    return min(rs, max(512, -(-c // 512) * 512))


def compact_select(v, C: int):
    """Stable valid-first compaction bookkeeping for a flat validity mask.

    v: [RS] bool. Returns (keep [C] int32 — flat index of the j-th valid
    slot (unused tail holds arbitrary in-bounds indices; every consumer
    masks by cvalid and the expand scatter drops tail rows), rank [RS] —
    each slot's rank among valid slots, sel [RS] — valid AND within
    capacity, cvalid [C] — compact rows holding a real slot, n_valid []).
    """
    RS = v.shape[0]
    d_ar = jnp.arange(RS, dtype=jnp.int32)
    rank = jnp.cumsum(v.astype(jnp.int32)) - 1
    n_valid = jnp.sum(v.astype(jnp.int32))
    sel = v & (rank < C)
    # keep via a 2-operand unstable sort (keys unique: selected slots get
    # their rank, the rest distinct tail keys): the first C payloads are
    # the flat indices of the valid slots in order. Replaces the [RS]-row
    # unique-destination scatter — sorts move elements ~10x cheaper per
    # element than random-access rows on this chip (PERF.md round 4).
    key = jnp.where(sel, rank, RS + d_ar)
    _, keep_full = jax.lax.sort((key, d_ar), num_keys=1, is_stable=False)
    keep = keep_full[:C]
    cvalid = jnp.arange(C, dtype=jnp.int32) < jnp.minimum(n_valid, C)
    return keep, rank, sel, cvalid, n_valid


def expand_compact(a_c, keep, cvalid, fill, R: int, SR: int):
    """Scatter a [C(,1),...] compact tensor back to the dense [R, SR, ...]
    frame; non-selected slots get `fill`.

    Written as a forward SCATTER-SET (unique destinations, tail rows
    dropped) rather than a rank-gather: autodiff then produces a cheap
    [C]-row gather in the backward instead of a [R*SR]-row scatter-add —
    the gather formulation's backward scatters dominated the step trace."""
    RS = R * SR
    a = a_c[:, 0] if a_c.ndim > 1 and a_c.shape[1] == 1 else a_c
    C = a.shape[0]
    base = jnp.broadcast_to(jnp.asarray(fill, a.dtype), (RS,) + a.shape[1:])
    # invalid compact rows -> distinct out-of-bounds slots, dropped
    dst = jnp.where(cvalid, keep, RS + jnp.arange(C, dtype=jnp.int32))
    full = base.at[dst].set(a, mode="drop", unique_indices=True)
    return full.reshape((R, SR) + a.shape[1:])


def expand_compact_many(arrs_fills, keep, cvalid, R: int, SR: int):
    """One packed scatter-set for several compact tensors at once.

    Each (a_c [C(,1)(,w)], fill) pair is flattened to [C, w] f32, packed
    into a single [C, Σw] row, expanded with ONE unique-destination
    scatter (round-4 trace: five separate expand_compact scatters cost
    ~1.5 ms each; the packed row costs one — random-access cost on this
    chip is per ROW, not per byte), and split back. Values are exactly
    those of per-tensor expand_compact."""
    RS = R * SR
    cols, fills, shapes, dtypes = [], [], [], []
    for a_c, fill in arrs_fills:
        a = a_c[:, 0] if a_c.ndim > 1 and a_c.shape[1] == 1 else a_c
        shapes.append(a.shape[1:])
        dtypes.append(a.dtype)
        w = int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1
        cols.append(a.reshape(a.shape[0], w).astype(jnp.float32))
        fills.append(jnp.full((w,), fill, jnp.float32))
    C = cols[0].shape[0]
    packed = jnp.concatenate(cols, axis=-1)                   # [C, W]
    base = jnp.broadcast_to(jnp.concatenate(fills), (RS, packed.shape[1]))
    dst = jnp.where(cvalid, keep, RS + jnp.arange(C, dtype=jnp.int32))
    full = base.at[dst].set(packed, mode="drop", unique_indices=True)
    outs, off = [], 0
    for shp, dt in zip(shapes, dtypes):
        w = int(np.prod(shp, dtype=np.int64)) if shp else 1
        piece = full[:, off:off + w].reshape((R, SR) + shp)
        if dt == jnp.bool_:
            piece = piece > 0.5
        else:
            piece = piece.astype(dt)
        outs.append(piece)
        off += w
    return outs


def decode_compacted(params: Dict, cfg: PointNeRFConfig, sp, cloc, cloc_w,
                     craydir, Rw2c, compute_dtype):
    """Aggregate a compact [C, 1, K] neighbor batch (remat-wrapped like the
    dense path)."""
    def _agg(params, sp, cloc, cloc_w, craydir, Rw2c):
        return aggregate(params, cfg.agg, sp, cloc[:, None], cloc_w[:, None],
                         craydir[:, None], cfg.query.vsize, Rw2c=Rw2c,
                         compute_dtype=compute_dtype)

    if cfg.parallel.remat:
        _agg = jax.checkpoint(_agg)
    return _agg(params, sp, cloc, cloc_w, craydir, Rw2c)


def conf_coeff_fill(cfg: PointNeRFConfig, pc: PointCloud):
    """Dense-path conf_coefficient value for invalid lanes: clamp(conf[0])
    (gathers clamp pidx -1 -> 0) — never enters any loss (losses mask by
    weight > 0) but kept for output parity with the dense decode."""
    return (jnp.clip(pc.conf[0, 0], 0.0001, 1.0)
            if cfg.agg.point_conf_mode else 1.0)


def shade_compacted(params: Dict, cfg: PointNeRFConfig, pc: PointCloud,
                    grid, sample_loc_w, sample_mask,
                    batch: RayBatch, Rw2c,
                    compute_dtype=jnp.float32,
                    train: bool = False) -> RenderOutput:
    """Static-capacity compacted KNN + decode (QueryConfig.decode_capacity).

    The reference compacts valid (ray, sample) slots dynamically with boolean
    indexing (point_aggregators.py:522-534); dynamic shapes don't jit, so this
    compacts to a STATIC capacity C: valid slots keep their stable ray-major
    rank, the first C are gathered, KNN-queried and decoded as a [C, 1, K]
    batch, and the results scattered back into the dense [R, SR] frame
    (invalid slots get the exact fill values the masked dense decode produces,
    so the two paths are numerically identical —
    tests/test_compact_decode.py). The KNN candidate sort, payload gather, PE,
    MLPs, and their backward scatters all shrink by ~the valid fraction
    (typically 5-25% for object-centric batches). Valid slots beyond C render
    as background and are counted in `decode_dropped`.

    sample_loc_w/sample_mask are the PRE-KNN shading selection
    (ops.query.generate_shading_points).
    """
    from ..ops.query import knn_query
    if cfg.train.compute_dtype == "bf16":
        compute_dtype = jnp.bfloat16
    R, SR = sample_mask.shape
    RS = R * SR
    C = decode_slots(cfg, RS)

    v = sample_mask.reshape(RS)
    keep, rank, sel, cvalid, n_valid = compact_select(v, C)

    cloc_w = jnp.where(cvalid[:, None],
                       sample_loc_w.reshape(RS, 3)[keep], 0.0)   # [C, 3]
    craydir = batch.raydir[keep // SR]                           # [C, 3]

    cpidx, _d2 = knn_query(cloc_w[:, None], cvalid[:, None], pc.xyz, grid,
                           cfg.query)                            # [C, 1, K]

    xyz_pers = w2pers(pc.xyz, batch.camrotc2w, batch.campos)
    sp = gather_points(pc, xyz_pers, cpidx,
                       bwd=cfg.query.gather_bwd)         # [C,1,K,*]
    cmask = cvalid & jnp.any(cpidx[:, 0] >= 0, axis=-1)          # [C] final
    cloc = w2pers(cloc_w, batch.camrotc2w, batch.campos)
    cloc = jnp.where(cmask[:, None], cloc, 0.0)
    cloc_w = jnp.where(cmask[:, None], cloc_w, 0.0)
    if Rw2c is not None and Rw2c.ndim == 3:
        # per-point rotations [N,3,3] (editing composites): gather per neighbor
        Rw2c = Rw2c[jnp.maximum(cpidx, 0)]                       # [C,1,K,3,3]

    agg = decode_compacted(params, cfg, sp, cloc, cloc_w, craydir, Rw2c,
                           compute_dtype)

    # scatter back to the dense [R, SR] frame — ONE packed row per slot
    # (final_mask: dense post-KNN sample mask — slots whose query found
    # >= 1 neighbor; governs sample_loc zeroing / ray_mask)
    features, weight, conf_coeff, ray_valid, final_mask = expand_compact_many(
        [(agg.features, 0.0), (agg.weight, 0.0),
         (agg.conf_coefficient, conf_coeff_fill(cfg, pc)),
         (agg.ray_valid, False), (cmask, False)],
        keep, cvalid, R, SR)

    sample_loc = w2pers(sample_loc_w, batch.camrotc2w, batch.campos)
    sample_loc = jnp.where(final_mask[..., None], sample_loc, 0.0)
    ray_mask = jnp.any(final_mask, axis=-1)
    out = _finalize(cfg, features, ray_valid, weight, conf_coeff,
                    sample_loc, sample_loc_w, ray_mask,
                    decode_dropped=n_valid - jnp.sum(sel.astype(jnp.int32)),
                    train=train)
    return out._replace(neighbor_pidx=cpidx[:, 0])


def _shade_at(params, pc: PointCloud, st: PointCloudStatic, grid,
              batch: RayBatch, cfg: PointNeRFConfig, sample_loc_w,
              sample_mask, prob: bool, compute_dtype,
              train: bool = False) -> RenderOutput:
    """KNN + gather + shade at explicit world shading locations (shared by
    the occupancy-selected coarse pass and the importance-resampled fine
    pass)."""
    from ..ops.query import knn_query
    if cfg.query.decode_capacity > 0 and not prob:
        return shade_compacted(params, cfg, pc, grid, sample_loc_w,
                               sample_mask, batch, st.Rw2c,
                               compute_dtype=compute_dtype, train=train)
    sample_pidx, _d2 = knn_query(sample_loc_w, sample_mask, pc.xyz, grid,
                                 cfg.query)
    pnt_mask = sample_pidx >= 0
    sample_mask = sample_mask & jnp.any(pnt_mask, axis=-1)
    sample_loc_w = jnp.where(sample_mask[..., None], sample_loc_w, 0.0)

    xyz_pers = w2pers(pc.xyz, batch.camrotc2w, batch.campos)
    sp = gather_points(pc, xyz_pers, sample_pidx,
                       bwd=cfg.query.gather_bwd)
    sample_loc = w2pers(sample_loc_w, batch.camrotc2w, batch.campos)
    sample_loc = jnp.where(sample_mask[..., None], sample_loc, 0.0)
    sample_ray_dirs = jnp.broadcast_to(batch.raydir[:, None, :],
                                       sample_loc_w.shape)
    Rw2c = st.Rw2c
    if Rw2c.ndim == 3:
        Rw2c = Rw2c[jnp.maximum(sample_pidx, 0)]
    out = shade(params, cfg, sp, sample_loc, sample_loc_w, sample_ray_dirs,
                Rw2c, prob=prob, compute_dtype=compute_dtype, train=train)
    return out._replace(neighbor_pidx=sample_pidx)


def render_rays(params: Dict, pc: PointCloud, st: PointCloudStatic,
                grid: PointGrid, batch: RayBatch, cfg: PointNeRFConfig,
                key: Optional[jnp.ndarray] = None, train: bool = False,
                prob: bool = False,
                compute_dtype=jnp.float32) -> RenderOutput:
    """Render a batch of rays against the neural point cloud."""
    from ..config import generator_kwargs
    k_coarse = k_fine = k_nerf = None
    if key is not None:
        if cfg.render.nerf_importance > 0:
            k_coarse, k_fine, k_nerf = jax.random.split(key, 3)
        else:
            k_coarse, k_fine = jax.random.split(key)
    if cfg.query.decode_capacity > 0 and not prob:
        # static-capacity valid-slot compaction before the KNN (prob-mode
        # probes need the full [R,SR,K] gathered payloads for argmax stats —
        # dense there)
        from ..ops.query import generate_shading_points
        sample_loc_w, sample_mask = generate_shading_points(
            grid, batch.campos, batch.raydir, float(cfg.render.near_plane),
            float(cfg.render.far_plane), cfg.query,
            jitter=cfg.render.train_jitter if train else 0.0, key=k_coarse,
            gen_name=_effective_gen(cfg), gen_kwargs=generator_kwargs(cfg))
        out = _shade_at(params, pc, st, grid, batch, cfg, sample_loc_w,
                        sample_mask, prob=prob, compute_dtype=compute_dtype,
                        train=train)
    else:
        q: QueryResult = query_points(
            pc.xyz, grid, batch.campos, batch.raydir,
            float(cfg.render.near_plane), float(cfg.render.far_plane),
            cfg.query, jitter=cfg.render.train_jitter if train else 0.0,
            key=k_coarse, gen_name=_effective_gen(cfg),
            gen_kwargs=generator_kwargs(cfg))

        # Perspective coords of all points for this camera
        # (neural_points.py:635).
        xyz_pers = w2pers(pc.xyz, batch.camrotc2w, batch.campos)
        sp = gather_points(pc, xyz_pers, q.sample_pidx,
                           bwd=cfg.query.gather_bwd)
        sample_loc = w2pers(q.sample_loc_w, batch.camrotc2w, batch.campos)
        sample_loc = jnp.where(q.sample_mask[..., None], sample_loc, 0.0)

        sample_ray_dirs = jnp.broadcast_to(batch.raydir[:, None, :],
                                           q.sample_loc_w.shape)
        Rw2c = st.Rw2c
        if Rw2c.ndim == 3:
            # per-point rotations (editing composites): gather per neighbor
            Rw2c = Rw2c[jnp.maximum(q.sample_pidx, 0)]      # [R,SR,K,3,3]
        out = shade(params, cfg, sp, sample_loc, q.sample_loc_w,
                    sample_ray_dirs, Rw2c, prob=prob,
                    compute_dtype=compute_dtype, train=train)
        out = out._replace(neighbor_pidx=q.sample_pidx)

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
        # out.ray_valid == the post-KNN sample mask on both decode paths
        t = jnp.sum((out.sample_loc_w - batch.campos[None, None, :])
                    * batch.raydir[:, None, :], -1) / rd2          # [R,SR]
        t = jnp.where(out.ray_valid, t, far)
        # blend weights recomputed from the coarse opacities with the same
        # exclusive-cumprod transmission AND the configured blend function,
        # matching ray_march's blend_weight output (the reference feeds
        # ray_march's blend_func(opacity, acc) into refine, :540)
        from .ray_march import BLEND_FUNCS
        alpha = out.coarse_point_opacity
        acc = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        acc = jnp.concatenate([jnp.ones_like(acc[:, :1]), acc[:, :-1]], -1)
        blend = BLEND_FUNCS[cfg.render.which_blend_func]
        w = jnp.where(out.ray_valid, blend(alpha, acc), 0.0)
        fine_pos, _seg, mid = refine_ray_generation(
            batch.campos, batch.raydir, cfg.render.fine_sample_num,
            jax.lax.stop_gradient(t), jax.lax.stop_gradient(w),
            jitter=cfg.render.train_jitter if train else 0.0, key=k_fine)
        fine_mask = jnp.broadcast_to(out.ray_mask[:, None], mid.shape)
        fine_out = _shade_at(params, pc, st, grid, batch, cfg, fine_pos,
                             fine_mask, prob=False,
                             compute_dtype=compute_dtype, train=train)
        out = out._replace(fine_raycolor=fine_out.coarse_raycolor,
                           fine_neighbor_pidx=fine_out.neighbor_pidx)
    if cfg.render.nerf_importance > 0 and "nerf" in params:
        out = _hybrid_march(params, out, batch, cfg, key=k_nerf,
                            train=train, compute_dtype=compute_dtype)
    return out


def _hybrid_march(params: Dict, out: RenderOutput, batch: RayBatch,
                  cfg: PointNeRFConfig, key=None, train: bool = False,
                  compute_dtype=jnp.float32) -> RenderOutput:
    """Proposal-NeRF hybrid compositing (fork --proposal_nerf, redesigned
    TPU-native — see models/nerf_branch.py). A coarse radiance-field pass
    builds a proposal distribution, `nerf_importance` z's are drawn from
    it, decoded by the NeRF MLP, z-MERGED with the point samples (one
    static [R, SR+Ni] two-operand sort, the jit equivalent of the
    reference's torch.sort+gather, multiseq_model.py:347-366) and the
    merged sequence is marched once: the field covers what the point cloud
    misses, points keep the detail. Replaces coarse_raycolor; the
    points-only march stays in the other outputs (opacities feed the fine
    pass / probes)."""
    from .nerf_branch import coarse_ray_march, importance_z, nerf_eval
    r = cfg.render
    Ni = r.nerf_importance
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)

    # point samples' ray parameter (same projection as the fine pass)
    rd2 = jnp.sum(batch.raydir * batch.raydir, -1, keepdims=True)
    t_pts = jnp.sum((out.sample_loc_w - batch.campos[None, None, :])
                    * batch.raydir[:, None, :], -1) / rd2        # [R, SR]
    far = jnp.asarray(r.far_plane, jnp.float32)
    t_pts = jnp.where(out.ray_valid, t_pts, far + 1.0)  # invalids sort last

    z_c, w_c, rgb_c = coarse_ray_march(params["nerf"], batch.campos,
                                       batch.raydir, cfg, key=k1,
                                       train=train,
                                       compute_dtype=compute_dtype)
    z_i = importance_z(z_c, jax.lax.stop_gradient(w_c), Ni,
                       det=not train, key=k2)                    # [R, Ni]
    pts = (batch.campos[None, None, :]
           + z_i[..., None] * batch.raydir[:, None, :])
    feats_n = nerf_eval(params["nerf"], pts,
                        jnp.broadcast_to(batch.raydir[:, None, :],
                                         pts.shape),
                        cfg, compute_dtype)                      # [R,Ni,1+C]

    feats_p = jnp.where(out.ray_valid[..., None], out.sample_features, 0.0)
    z_all = jnp.concatenate([t_pts, z_i], axis=-1)               # [R, S+Ni]
    feats_all = jnp.concatenate([feats_p, feats_n], axis=-2)
    valid_all = jnp.concatenate(
        [out.ray_valid, jnp.ones(z_i.shape, bool)], axis=-1)
    idx = jnp.broadcast_to(
        jnp.arange(z_all.shape[-1], dtype=jnp.int32)[None], z_all.shape)
    z_s, idx_s = jax.lax.sort((z_all, idx), num_keys=1)
    feats_s = jnp.take_along_axis(feats_all, idx_s[..., None], axis=-2)
    valid_s = jnp.take_along_axis(valid_all, idx_s, axis=-1)

    vz = cfg.query.vsize[2]
    dists = jnp.concatenate(
        [z_s[:, 1:] - z_s[:, :-1],
         jnp.full(z_s[:, :1].shape, vz, jnp.float32)], axis=-1)
    # a gap whose far end is an invalid sample (the sorted-to-back block at
    # far+1) is meaningless — the last VALID sample would otherwise absorb a
    # multi-unit integration distance. Clamp it to one voxel by looking at
    # the NEXT slot's validity (the reference's coarser
    # ray_dist[ray_dist>100]=vsize, :378, only fires on its huge-z padding).
    nxt_invalid = jnp.concatenate(
        [~valid_s[:, 1:], jnp.ones(valid_s[:, :1].shape, bool)], axis=-1)
    dists = jnp.where(nxt_invalid, vz, dists)

    render_func = RENDER_FUNCS[cfg.render.which_render_func]
    blend_func = BLEND_FUNCS[cfg.render.which_blend_func]
    tonemap = TONEMAP_FUNCS[cfg.render.which_tonemap_func]
    bg = jnp.asarray(r.bg_color, jnp.float32)
    if cfg.agg.shading_color_channel_num != 3:
        bg = jnp.zeros((cfg.agg.shading_color_channel_num,), jnp.float32)
    (ray_color, _pc, _op, _acc, bw, bg_trans, _bgw) = ray_march(
        dists, valid_s, feats_s, render_func, blend_func, bg)

    # point-creation signals: blend mass carried by the FIELD samples (the
    # sorted indices >= SR mark them), their expected location and color
    SR = out.ray_valid.shape[-1]
    w_n = jnp.where(idx_s >= SR, bw[..., 0], 0.0)            # [R, S+Ni]
    mass = jnp.sum(w_n, axis=-1, keepdims=True)              # [R, 1]
    zbar = jnp.sum(w_n * z_s, axis=-1, keepdims=True) / (mass + 1e-8)
    loc_w = batch.campos[None, :] + zbar * batch.raydir      # [R, 3]
    col_n = (jnp.sum(w_n[..., None] * feats_s[..., 1:4], axis=-2)
             / (mass + 1e-8))                                # [R, <=3]
    return out._replace(coarse_raycolor=tonemap(ray_color),
                        coarse_is_background=bg_trans,
                        nerf_coarse_raycolor=tonemap(rgb_c),
                        sample_features=None,
                        nerf_mass=mass, nerf_loc_w=loc_w, nerf_color=col_n)
