"""Point-sharded, ray-data-parallel training over a (dp, mp) mesh.

TPU-native redesign of the reference's parallelism (SURVEY.md §2.3):
DataParallel scatter/gather (neural_points_volumetric_model.py:173-176) and
NCCL DDP gradient all-reduce (train_ddp.py:632-669) become explicit XLA
collectives under `jax.shard_map`:

  - rays are sharded over `dp`; MLP gradients are `pmean`ed over the mesh.
  - the neural point cloud (and its occupancy grid + Adam state) is sharded
    over `mp`. Each mp-shard runs the voxel KNN against its local points for
    its dp-shard's full ray set, gathers the K best local candidates with
    payloads, then a single `all_to_all` redistributes candidates so each
    shard holds all shards' candidates for 1/mp of the rays. A global top-K
    over the mp*K merged candidates reproduces the unsharded KNN exactly
    (points are disjoint across shards), and shading proceeds on rays split
    dp*mp ways — both memory (N) and compute (rays) scale with the mesh.
  - shading-point selection needs the occupancy of the *union* cloud; the
    union is psum-reduced once at grid-build time, not per step.

Gradients flow through the all_to_all (its transpose is the reverse
all_to_all), so point-attribute updates land on the owning shard with no
extra communication.

Sharded-KNN parity note: with `shell_layered=False` the merged top-K equals
the unsharded top-K exactly (up to distance ties / per-voxel bucket caps —
each shard's buckets hold up to P points, so the merged pool can see up to
mp*P per voxel, a strict superset). With `shell_layered=True` the CUDA-style
shell cutoff is evaluated per shard against local candidate counts, so the
merged set can include slightly farther candidates than a single-device run —
a quality-neutral deviation, documented here per SURVEY.md §7 ("parity =
same distance multiset").
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import w2pers
from ..config import PointNeRFConfig
from ..models.losses import compute_losses, mse2psnr
from ..models.points import (DEAD_XYZ, PointCloud, PointCloudStatic,
                             SampledPoints, gather_points, make_point_cloud,
                             round_capacity)
from ..models.renderer import RayBatch, RenderOutput, shade
from ..ops.grid import PointGrid, build_grid, grid_meta
from ..ops.query import (RAY_GENERATORS, knn_query, select_shading_points)
from ..train.optim import (alternated_update, apply_grad_flags,
                           freeze_points, make_optimizer)
from ..train.step import TrainState


class ShardedScene(NamedTuple):
    """Sharded companion state: per-shard grids + replicated union occupancy.

    Leaves with a leading [mp] axis are sharded over the mesh's mp axis."""
    num_active: jnp.ndarray   # [mp] int32 — live points per shard
    Rw2c: jnp.ndarray         # [3, 3] replicated
    vox_slot: jnp.ndarray     # [mp, G] int32 — per-shard voxel -> bucket slot
    bucket_pnt: jnp.ndarray   # [mp, max_o, P] int32 — per-shard point buckets
    bucket_cnt: jnp.ndarray   # [mp, max_o] int32
    bucket_xyz: jnp.ndarray   # [mp, max_o, P, 3] — bucket-major positions
    occ_union: jnp.ndarray    # [G] int8 — union dilated occupancy (replicated)
    # Per-shard prebuilt neighbor tables (cfg.query.prebuild_neighbors): each
    # shard's table covers ITS OWN dilated occupancy over ITS OWN points. A
    # shading point outside a shard's dilation has no local candidates by
    # construction (query_size >= kernel_size), so dslot == -1 -> empty is
    # exact, and the all_to_all merge reproduces the unsharded KNN. None when
    # disabled (pytree structure is config-static).
    vox_dslot: Optional[jnp.ndarray] = None  # [mp, G] int32
    nbr_xyz: Optional[jnp.ndarray] = None    # [mp, max_d, 3, Q*P] f32
    nbr_pid: Optional[jnp.ndarray] = None    # [mp, max_d, Q*P] int32
    # Concatenated per-shard dilated-occupied cell lists (replicated); the
    # merge slot selection tolerates duplicates across shards, so the union
    # needs no dedup — just an all_gather at grid-build time.
    occ_vids: Optional[jnp.ndarray] = None   # [mp * max_d] int32, pad G


def scene_specs(prebuilt: bool) -> ShardedScene:
    """PartitionSpec tree matching ShardedScene's pytree structure (None
    fields are empty subtrees and must be None in the spec tree too)."""
    nb = P("mp") if prebuilt else None
    return ShardedScene(
        num_active=P("mp"), Rw2c=P(), vox_slot=P("mp"), bucket_pnt=P("mp"),
        bucket_cnt=P("mp"), bucket_xyz=P("mp"), occ_union=P(),
        vox_dslot=nb, nbr_xyz=nb, nbr_pid=nb, occ_vids=P())


def partition_points(xyz: np.ndarray, key, cfg: PointNeRFConfig, mp: int,
                     features: Optional[np.ndarray] = None,
                     color: Optional[np.ndarray] = None,
                     dirs: Optional[np.ndarray] = None,
                     conf: Optional[np.ndarray] = None,
                     capacity_per_shard: Optional[int] = None,
                     ) -> Tuple[PointCloud, jnp.ndarray]:
    """Round-robin partition of a raw cloud into mp equal shards.

    Returns (PointCloud with [mp, cap_s, ...] leaves, num_active [mp]).
    Round-robin (point i -> shard i % mp) load-balances spatially sorted
    input clouds across shards."""
    n = xyz.shape[0]
    per = [np.arange(j, n, mp) for j in range(mp)]
    cap = capacity_per_shard or round_capacity(max(len(p) for p in per))
    keys = jax.random.split(key, mp)

    shards, counts = [], []
    for j in range(mp):
        sel = per[j]
        pc_j, st_j = make_point_cloud(
            xyz[sel], keys[j], cfg.points, cfg.agg.point_features_dim,
            features=None if features is None else features[sel],
            color=None if color is None else color[sel],
            dirs=None if dirs is None else dirs[sel],
            conf=None if conf is None else conf[sel],
            capacity=cap)
        shards.append(pc_j)
        counts.append(int(st_j.num_active))
    pc = jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    return pc, jnp.asarray(counts, jnp.int32)


def partition_points_multiseq(clouds, key, cfg: PointNeRFConfig, mp: int,
                              capacity_per_shard: Optional[int] = None):
    """Partition a MULTI-SEQUENCE scene (one point cloud per sequence —
    the fork's per-sequence waymo clouds, train_ddp.py:720-740) onto the mp
    point axis.

    clouds: list of per-sequence dicts with "xyz" and optional
    "color"/"dirs"/"feature"/"conf" arrays (data/waymo.WaymoDataset
    load_init_points output).

    Mapping: with mp >= n_seq, shards are split among sequences
    proportionally to point count (each sequence at least one shard) and
    each sequence round-robins its points across its shard group — locality
    is per-sequence, like the fork holding sequence s's cloud on the DDP
    ranks that train it. With mp < n_seq, sequence j lands on shard
    j % mp (concatenated).

    Returns (PointCloud [mp, cap_s, ...], num_active [mp],
    shard_seq [mp] — owning sequence index per shard, -1 for mixed shards).
    """
    n_seq = len(clouds)
    assert n_seq >= 1 and mp >= 1
    sizes = [c["xyz"].shape[0] for c in clouds]

    def seq_arrays(j):
        c = clouds[j]
        return (np.asarray(c["xyz"], np.float32), c.get("feature"),
                c.get("color"), c.get("dirs"), c.get("conf"))

    # per-shard (xyz, feature, color, dirs, conf, owner) assembly
    shard_parts: list = [[] for _ in range(mp)]
    shard_seq = np.full((mp,), -1, np.int64)
    if mp >= n_seq:
        # proportional shard allocation, >= 1 each, summing to mp
        alloc = np.maximum(1, np.floor(
            np.asarray(sizes, np.float64) / max(sum(sizes), 1) * mp)
            .astype(np.int64))
        while alloc.sum() > mp:
            alloc[np.argmax(alloc)] -= 1
        while alloc.sum() < mp:
            alloc[np.argmin(alloc / np.maximum(np.asarray(sizes), 1))] += 1
        s0 = 0
        for j in range(n_seq):
            group = list(range(s0, s0 + int(alloc[j])))
            s0 += int(alloc[j])
            xyz_j, *rest = seq_arrays(j)
            for gi, s in enumerate(group):
                sel = np.arange(gi, xyz_j.shape[0], len(group))
                shard_parts[s].append(
                    (xyz_j[sel],) + tuple(None if r is None else
                                          np.asarray(r)[sel] for r in rest))
                shard_seq[s] = j
    else:
        for j in range(n_seq):
            xyz_j, *rest = seq_arrays(j)
            s = j % mp
            shard_parts[s].append(
                (xyz_j,) + tuple(None if r is None else np.asarray(r)
                                 for r in rest))
            shard_seq[s] = j if shard_seq[s] in (-1, j) else -1

    # per-payload defaults matching make_point_cloud's missing-payload init,
    # so a MIXED shard (mp < n_seq) keeps the real payloads of sequences
    # that have them instead of silently random-initing the whole shard
    def _default(i, n, rng):
        if i == 1:   # feature — 'rand' init, uniform(0,1)*1e-2
            if cfg.points.feature_init_method == "zeros":
                return np.zeros((n, cfg.agg.point_features_dim), np.float32)
            return rng.rand(n, cfg.agg.point_features_dim).astype(
                np.float32) * 0.01
        if i == 4:   # conf
            return np.full((n, 1), cfg.points.default_conf, np.float32)
        return np.zeros((n, 3), np.float32)  # color / dirs

    def cat(parts, i, rng=None):
        if all(p[i] is None for p in parts):
            return None
        return np.concatenate(
            [p[i] if p[i] is not None else _default(i, p[0].shape[0], rng)
             for p in parts])

    per = [cat(p, 0) for p in shard_parts]
    cap = capacity_per_shard or round_capacity(max(x.shape[0] for x in per))
    keys = jax.random.split(key, mp)
    shards, counts = [], []
    for s in range(mp):
        rng = np.random.RandomState(1000 + s)
        pc_s, st_s = make_point_cloud(
            per[s], keys[s], cfg.points, cfg.agg.point_features_dim,
            features=cat(shard_parts[s], 1, rng),
            color=cat(shard_parts[s], 2, rng),
            dirs=cat(shard_parts[s], 3, rng),
            conf=cat(shard_parts[s], 4, rng),
            capacity=cap)
        shards.append(pc_s)
        counts.append(int(st_s.num_active))
    pc = jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    return pc, jnp.asarray(counts, jnp.int32), shard_seq


def build_sharded_scene(pc: PointCloud, num_active: jnp.ndarray,
                        cfg: PointNeRFConfig, mesh: Mesh,
                        Rw2c: Optional[jnp.ndarray] = None) -> ShardedScene:
    """Build per-shard occupancy grids + the union occupancy, under shard_map.

    Rebuild only on point-set change (prune/grow) — the reference rebuilds
    every iteration (query_point_indices_worldcoords.py:626)."""
    if Rw2c is None:
        Rw2c = jnp.eye(3, dtype=jnp.float32)

    prebuilt = cfg.query.prebuild_neighbors

    def builder(xyz_s, num_s):
        grid = build_grid(xyz_s[0], num_s[0], cfg.query)
        # Union occupancy across point shards (int32 psum; int8 could overflow)
        occ_union = (jax.lax.psum(grid.vox_occ.astype(jnp.int32), "mp") > 0
                     ).astype(jnp.int8)
        # Union dilated-cell list for the merge slot selection: concat of
        # the shards' sorted lists (duplicates are harmless there)
        occ_vids = jax.lax.all_gather(grid.occ_vids, "mp",
                                      tiled=True)         # [mp * max_d]
        out = (grid.vox_slot[None], grid.bucket_pnt[None],
               grid.bucket_cnt[None], grid.bucket_xyz[None], occ_union,
               occ_vids)
        if prebuilt:
            out += (grid.vox_dslot[None], grid.nbr_xyz[None],
                    grid.nbr_pid[None])
        return out

    out_specs = (P("mp"), P("mp"), P("mp"), P("mp"), P(), P())
    if prebuilt:
        out_specs += (P("mp"), P("mp"), P("mp"))
    # check_vma=False: JAX 0.9's varying-axes inference can't statically
    # prove all_gather(tiled=True) output is replicated over mp (no
    # all_gather_invariant in this release), but it is — every shard holds
    # the identical concatenated list.
    outs = jax.jit(jax.shard_map(
        builder, mesh=mesh, in_specs=(P("mp"), P("mp")),
        out_specs=out_specs, check_vma=False))(pc.xyz, num_active)
    vox_slot, bucket_pnt, bucket_cnt, bucket_xyz, occ_union, occ_vids = outs[:6]
    nbr = outs[6:] if prebuilt else (None, None, None)
    return ShardedScene(num_active=num_active, Rw2c=Rw2c, vox_slot=vox_slot,
                        bucket_pnt=bucket_pnt, bucket_cnt=bucket_cnt,
                        bucket_xyz=bucket_xyz, occ_union=occ_union,
                        occ_vids=occ_vids,
                        vox_dslot=nbr[0], nbr_xyz=nbr[1], nbr_pid=nbr[2])


def _a2a(x, mp: int):
    """Redistribute per-ray KNN candidates: split rays over mp, concat the
    candidate (K) axis. Identity when mp == 1."""
    if mp == 1:
        return x
    return jax.lax.all_to_all(x, "mp", split_axis=0, concat_axis=2, tiled=True)


def _render_local(mlp_params, pc_local: PointCloud, scene_local: PointGrid,
                  num_active_local, Rw2c, batch: RayBatch,
                  cfg: PointNeRFConfig, key, train: bool, mp: int,
                  prob: bool = False, compute_dtype=jnp.float32
                  ) -> Tuple[RenderOutput, jnp.ndarray]:
    """Per-device forward: local KNN -> all_to_all merge -> shade 1/mp rays.

    Returns (RenderOutput over R_local/mp rays, matching gt slice)."""
    q = cfg.query
    meta = grid_meta(q)
    Rl = batch.raydir.shape[0]
    assert Rl % mp == 0, f"rays per dp shard ({Rl}) must divide by mp ({mp})"

    # 1. Ray generation — the key is replicated over mp, so all point shards
    # see identical jittered sample positions for their dp-shard's rays.
    # Split like render_rays: coarse jitter / fine resample draws.
    from ..config import effective_ray_generator, generator_kwargs
    k_coarse = k_fine = k_nerf = None
    if key is not None:
        if cfg.render.nerf_importance > 0:
            k_coarse, k_fine, k_nerf = jax.random.split(key, 3)
        else:
            k_coarse, k_fine = jax.random.split(key)
    gen = RAY_GENERATORS[effective_ray_generator(cfg)]
    jitter = cfg.render.train_jitter if train else 0.0
    raypos, _seg, _t = gen(batch.campos, batch.raydir, q.z_depth_dim,
                           float(cfg.render.near_plane),
                           float(cfg.render.far_plane),
                           jitter=jitter, key=k_coarse,
                           **dict(generator_kwargs(cfg)))

    # 2. Shading-point selection against the UNION occupancy.
    sample_loc_w, sample_mask = select_shading_points(
        raypos, scene_local, meta, q.SR, select=q.slot_select)

    if q.decode_capacity > 0 and not prob:
        # Static-capacity compaction per ray block (models/renderer.py
        # shade_compacted, distributed): selection ran against the union
        # occupancy with a replicated key, so every mp shard computes
        # identical masks and identical compaction bookkeeping. Each ray
        # block compacts its rs*SR slots to Cb; local KNN + payload gather +
        # the all_to_all candidate exchange all run on the [mp*Cb] compact
        # slots (comm volume shrinks by the valid fraction), the merged top-K
        # block lands on its owning shard, and the decode scatters back into
        # that shard's dense [rs, SR] frame.
        out, gt_b = _render_local_compact(
            mlp_params, pc_local, scene_local, Rw2c, batch, cfg,
            sample_loc_w, sample_mask, mp, compute_dtype, train=train)
    else:
        out, gt_b = _shade_blocks_dense(
            mlp_params, pc_local, scene_local, Rw2c, batch, cfg,
            sample_loc_w, sample_mask, mp, compute_dtype, train=train,
            prob=prob)
    if cfg.render.fine_sample_num > 0 and not prob:
        out = _fine_local(mlp_params, pc_local, scene_local, Rw2c, batch,
                          cfg, out, k_fine, mp, compute_dtype, train)
    if cfg.render.nerf_importance > 0 and "nerf" in mlp_params:
        # proposal-NeRF hybrid rides the mesh trivially: the field MLP is
        # replicated, `out` covers this shard's own ray block, so the
        # merged march is purely local — only the block's raydir is needed.
        # The jitter key is mp-replicated (different ray blocks draw the
        # same stratification noise; det evals are bit-identical to the
        # single-device hybrid).
        from ..models.renderer import _hybrid_march
        rs = batch.raydir.shape[0] // mp
        my = jax.lax.axis_index("mp") if mp > 1 else 0
        raydir_b = jax.lax.dynamic_slice_in_dim(batch.raydir, my * rs, rs, 0)
        out = _hybrid_march(mlp_params, out, batch._replace(raydir=raydir_b),
                            cfg, key=k_nerf, train=train,
                            compute_dtype=compute_dtype)
    return out, gt_b


def _shade_blocks_dense(mlp_params, pc_local: PointCloud, scene_local,
                        Rw2c, batch: RayBatch, cfg: PointNeRFConfig,
                        sample_loc_w, sample_mask, mp: int, compute_dtype,
                        train: bool, prob: bool = False
                        ) -> Tuple[RenderOutput, jnp.ndarray]:
    """Dense sharded shading from replicated shading locations: local KNN ->
    all_to_all candidate merge -> this shard shades its own ray block."""
    q = cfg.query
    Rl = batch.raydir.shape[0]

    # 3. Local KNN (per-shard grid + points) over the full local ray set.
    pidx, d2 = knn_query(sample_loc_w, sample_mask, pc_local.xyz,
                         scene_local, q)

    # 4. Gather local payloads, then exchange candidates.
    xyz_pers = w2pers(pc_local.xyz, batch.camrotc2w, batch.campos)
    sp = gather_points(pc_local, xyz_pers, pidx,
                       bwd=cfg.query.gather_bwd)    # [Rl, SR, K, *]

    merged = SampledPoints(
        xyz=_a2a(sp.xyz, mp), xyz_pers=_a2a(sp.xyz_pers, mp),
        features=_a2a(sp.features, mp), conf=_a2a(sp.conf, mp),
        color=_a2a(sp.color, mp), dirs=_a2a(sp.dirs, mp),
        mask=sp.mask)                                  # mask recomputed below
    d2m = _a2a(jnp.where(sp.mask, d2, jnp.inf), mp)    # [Rl/mp, SR, mp*K]

    # 5. Global top-K over the merged mp*K candidates (points are disjoint
    # across shards, so this equals the unsharded KNN result).
    if mp > 1:
        neg, sel = jax.lax.top_k(-d2m, q.K)            # [Rl/mp, SR, K]
        d2_top = -neg

        def take(a):
            return jnp.take_along_axis(a, sel[..., None], axis=2)
        merged = SampledPoints(
            xyz=take(merged.xyz), xyz_pers=take(merged.xyz_pers),
            features=take(merged.features), conf=take(merged.conf),
            color=take(merged.color), dirs=take(merged.dirs),
            mask=jnp.isfinite(d2_top))
    else:
        merged = merged._replace(mask=jnp.isfinite(d2m))

    # 6. This shard shades ray block `my` of its dp-shard's rays.
    rs = Rl // mp
    my = jax.lax.axis_index("mp") if mp > 1 else 0

    def blk(a):
        return jax.lax.dynamic_slice_in_dim(a, my * rs, rs, axis=0)
    loc_w = blk(sample_loc_w)
    # Refine the slot mask by "has >=1 neighbor" exactly like query_points
    # (ops/query.py): empty slots must zero sample_loc or their z leaks into
    # the cummax-based ray_dist of later valid slots.
    loc_m = blk(sample_mask) & jnp.any(merged.mask, axis=-1)
    raydir_b = blk(batch.raydir)
    gt_b = blk(batch.gt_image) if batch.gt_image is not None else None

    sample_loc = w2pers(loc_w, batch.camrotc2w, batch.campos)
    sample_loc = jnp.where(loc_m[..., None], sample_loc, 0.0)
    ray_dirs = jnp.broadcast_to(raydir_b[:, None, :], loc_w.shape)

    out = shade(mlp_params, cfg, merged, sample_loc, loc_w, ray_dirs, Rw2c,
                prob=prob, compute_dtype=compute_dtype, train=train)
    return out, gt_b


def _render_local_compact(mlp_params, pc_local: PointCloud, grid, Rw2c,
                          batch: RayBatch, cfg: PointNeRFConfig,
                          sample_loc_w, sample_mask, mp: int, compute_dtype,
                          train: bool = False
                          ) -> Tuple[RenderOutput, jnp.ndarray]:
    """Compacted sharded shading (see _render_local): per-ray-block static
    compaction -> local KNN on compact slots -> all_to_all merge -> decode ->
    scatter back to the owning shard's dense frame."""
    from ..models.renderer import (_finalize, compact_select, conf_coeff_fill,
                                   decode_compacted, decode_slots,
                                   expand_compact_many)
    q = cfg.query
    if cfg.train.compute_dtype == "bf16":
        compute_dtype = jnp.bfloat16
    Rl, SR = sample_mask.shape
    rs = Rl // mp
    Cb = decode_slots(cfg, rs * SR)

    v = sample_mask.reshape(mp, rs * SR)
    keep, rank, sel, cvalid, n_valid = jax.vmap(
        lambda vb: compact_select(vb, Cb))(v)          # [mp, Cb] / [mp, rs*SR]

    # flat compact slots across all blocks: [mp*Cb]
    keep_glob = (keep + (jnp.arange(mp, dtype=jnp.int32) * rs * SR)[:, None]
                 ).reshape(mp * Cb)
    cv_all = cvalid.reshape(mp * Cb)
    cloc_w_all = jnp.where(cv_all[:, None],
                           sample_loc_w.reshape(Rl * SR, 3)[keep_glob], 0.0)

    # local KNN + payload gather on the compact slots only
    pidx, d2 = knn_query(cloc_w_all[:, None], cv_all[:, None],
                         pc_local.xyz, grid, q)        # [mp*Cb, 1, K]
    xyz_pers = w2pers(pc_local.xyz, batch.camrotc2w, batch.campos)
    sp = gather_points(pc_local, xyz_pers, pidx,
                       bwd=cfg.query.gather_bwd)    # [mp*Cb, 1, K, *]

    merged = SampledPoints(
        xyz=_a2a(sp.xyz, mp), xyz_pers=_a2a(sp.xyz_pers, mp),
        features=_a2a(sp.features, mp), conf=_a2a(sp.conf, mp),
        color=_a2a(sp.color, mp), dirs=_a2a(sp.dirs, mp),
        mask=sp.mask)
    d2m = _a2a(jnp.where(sp.mask, d2, jnp.inf), mp)    # [Cb, 1, mp*K]

    if mp > 1:
        neg, sel_k = jax.lax.top_k(-d2m, q.K)          # [Cb, 1, K]
        d2_top = -neg

        def take(a):
            return jnp.take_along_axis(a, sel_k[..., None], axis=2)
        merged = SampledPoints(
            xyz=take(merged.xyz), xyz_pers=take(merged.xyz_pers),
            features=take(merged.features), conf=take(merged.conf),
            color=take(merged.color), dirs=take(merged.dirs),
            mask=jnp.isfinite(d2_top))
    else:
        merged = merged._replace(mask=jnp.isfinite(d2m))

    # this shard decodes its own ray block's compact slots
    my = jax.lax.axis_index("mp") if mp > 1 else 0
    sel_my = jnp.take(sel, my, axis=0)                 # [rs*SR]
    keep_my = jnp.take(keep, my, axis=0)               # [Cb]
    cvalid_my = jnp.take(cvalid, my, axis=0)
    nv_my = jnp.take(n_valid, my, axis=0)

    def blk(a):
        return jax.lax.dynamic_slice_in_dim(a, my * rs, rs, axis=0)
    loc_w_blk = blk(sample_loc_w)                      # [rs, SR, 3]
    raydir_b = blk(batch.raydir)
    gt_b = blk(batch.gt_image) if batch.gt_image is not None else None

    cmask = cvalid_my & jnp.any(merged.mask[:, 0], axis=-1)      # [Cb]
    cloc_w = jnp.where(cmask[:, None],
                       loc_w_blk.reshape(rs * SR, 3)[keep_my], 0.0)
    craydir = raydir_b[keep_my // SR]
    cloc = w2pers(cloc_w, batch.camrotc2w, batch.campos)
    cloc = jnp.where(cmask[:, None], cloc, 0.0)

    agg = decode_compacted(mlp_params, cfg, merged, cloc, cloc_w, craydir,
                           Rw2c, compute_dtype)

    features, weight, conf_coeff, ray_valid, final_mask = expand_compact_many(
        [(agg.features, 0.0), (agg.weight, 0.0),
         (agg.conf_coefficient, conf_coeff_fill(cfg, pc_local)),
         (agg.ray_valid, False), (cmask, False)],
        keep_my, cvalid_my, rs, SR)

    sample_loc = w2pers(loc_w_blk, batch.camrotc2w, batch.campos)
    sample_loc = jnp.where(final_mask[..., None], sample_loc, 0.0)
    ray_mask = jnp.any(final_mask, axis=-1)
    out = _finalize(cfg, features, ray_valid, weight, conf_coeff,
                    sample_loc, loc_w_blk, ray_mask,
                    decode_dropped=nv_my - jnp.sum(sel_my.astype(jnp.int32)),
                    train=train)
    return out, gt_b


def _fine_local(mlp_params, pc_local: PointCloud, grid, Rw2c,
                batch: RayBatch, cfg: PointNeRFConfig, out: RenderOutput,
                key, mp: int, compute_dtype, train: bool) -> RenderOutput:
    """Sharded hierarchical refinement (render_rays' fine pass,
    models/renderer.py:418-450, distributed).

    The fine shading locations depend on the coarse DECODE (blend weights),
    which only the owning shard has for its ray block — so each shard
    importance-resamples its own block, then one tiled all_gather over mp
    replicates every block's fine positions + masks to all point shards
    (comm: Rl * D2 * 4 floats per device per direction). From there the flow
    is exactly the coarse one: local KNN on replicated locations ->
    all_to_all candidate merge -> the owning shard decodes its block.

    Train-time resample jitter draws per block (rs rays) where the
    single-chip path draws over the full batch — equivalent in
    distribution; deterministic eval (no key) is numerically identical.
    """
    from ..models.ray_march import BLEND_FUNCS
    from ..ops.query import refine_ray_generation
    Rl = batch.raydir.shape[0]
    rs = Rl // mp
    my = jax.lax.axis_index("mp") if mp > 1 else 0
    raydir_b = jax.lax.dynamic_slice_in_dim(batch.raydir, my * rs, rs, 0)

    far = jnp.asarray(cfg.render.far_plane, jnp.float32)
    rd2 = jnp.sum(raydir_b * raydir_b, -1, keepdims=True)
    t = jnp.sum((out.sample_loc_w - batch.campos[None, None, :])
                * raydir_b[:, None, :], -1) / rd2             # [rs, SR]
    t = jnp.where(out.ray_valid, t, far)
    alpha = out.coarse_point_opacity
    acc = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    acc = jnp.concatenate([jnp.ones_like(acc[:, :1]), acc[:, :-1]], -1)
    blend = BLEND_FUNCS[cfg.render.which_blend_func]
    w = jnp.where(out.ray_valid, blend(alpha, acc), 0.0)
    fine_pos, _seg, mid = refine_ray_generation(
        batch.campos, raydir_b, cfg.render.fine_sample_num,
        jax.lax.stop_gradient(t), jax.lax.stop_gradient(w),
        jitter=cfg.render.train_jitter if train else 0.0, key=key)
    fine_mask = jnp.broadcast_to(out.ray_mask[:, None], mid.shape)

    if mp > 1:
        pos_all = jax.lax.all_gather(fine_pos, "mp", tiled=True)
        mask_all = jax.lax.all_gather(fine_mask, "mp", tiled=True)
    else:
        pos_all, mask_all = fine_pos, fine_mask

    if cfg.query.decode_capacity > 0:
        f_out, _ = _render_local_compact(
            mlp_params, pc_local, grid, Rw2c, batch, cfg, pos_all, mask_all,
            mp, compute_dtype, train=train)
    else:
        f_out, _ = _shade_blocks_dense(
            mlp_params, pc_local, grid, Rw2c, batch, cfg, pos_all, mask_all,
            mp, compute_dtype, train=train)
    return out._replace(fine_raycolor=f_out.coarse_raycolor)


def _squeeze0(tree):
    return jax.tree.map(lambda x: x[0], tree)


def _local_grid(scene: ShardedScene) -> PointGrid:
    pre = scene.vox_dslot is not None
    return PointGrid(vox_slot=scene.vox_slot[0], vox_occ=scene.occ_union,
                     bucket_pnt=scene.bucket_pnt[0],
                     bucket_cnt=scene.bucket_cnt[0],
                     num_occ=jnp.asarray(0, jnp.int32),
                     bucket_xyz=scene.bucket_xyz[0],
                     vox_dslot=scene.vox_dslot[0] if pre else None,
                     nbr_xyz=scene.nbr_xyz[0] if pre else None,
                     nbr_pid=scene.nbr_pid[0] if pre else None,
                     occ_vids=scene.occ_vids)


def make_sharded_train_step(cfg: PointNeRFConfig, mesh: Mesh):
    """Build the jitted multi-chip training step.

    State layout: params['mlp'] replicated; params['points'] leaves
    [mp, cap_s, ...] sharded over mp (Adam state follows params, sharded by
    construction since optax state mirrors the param pytree)."""
    dp, mp = mesh.shape["dp"], mesh.shape["mp"]
    tx = make_optimizer(cfg)

    def device_grads(params, scene: ShardedScene, batch: RayBatch, key):
        grid = _local_grid(scene)
        Rw2c = scene.Rw2c

        def local_loss(p):
            pc_local = freeze_points(_squeeze0(p["points"]), cfg.points)
            out, gt = _render_local(p["mlp"], pc_local, grid,
                                    scene.num_active[0], Rw2c, batch, cfg,
                                    key, train=True, mp=mp)
            total, items = compute_losses(out, gt, cfg.loss)
            items["mse"] = jnp.mean((out.coarse_raycolor - gt) ** 2)
            if out.decode_dropped is not None:
                # total compacted-decode overflow across the mesh (psum of
                # equal-sized ray blocks; the later pmean over items is a
                # no-op on this already-uniform value)
                items["n_decode_dropped"] = jax.lax.psum(
                    out.decode_dropped, ("dp", "mp")).astype(jnp.float32)
            return total, items

        (total, items), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        # Global loss L = pmean over all (dp, mp) shards of the local loss
        # (each shard owns a disjoint, equal-size ray block). MLP params are
        # replicated: grad(L) = pmean of local grads. Point grads arrive on
        # the owning shard through the all_to_all transpose already summed
        # over mp consumers, so only the 1/(dp*mp) loss normalization and the
        # dp-replica mean remain.
        g_mlp = jax.tree.map(lambda g: jax.lax.pmean(g, ("dp", "mp")),
                             grads["mlp"])
        g_pts = jax.tree.map(lambda g: jax.lax.pmean(g, "dp") / mp,
                             grads["points"])
        total = jax.lax.pmean(total, ("dp", "mp"))
        items = jax.tree.map(lambda v: jax.lax.pmean(v, ("dp", "mp")), items)
        return {"mlp": g_mlp, "points": g_pts}, total, items

    grads_sm = jax.shard_map(
        device_grads, mesh=mesh,
        in_specs=({"mlp": P(), "points": P("mp")},
                  scene_specs(cfg.query.prebuild_neighbors),
                  RayBatch(campos=P(), camrotc2w=P(), raydir=P("dp"),
                           pixel_idx=P("dp"), near=P(), far=P(),
                           gt_image=P("dp")),
                  P()),
        out_specs=({"mlp": P(), "points": P("mp")}, P(), P()),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, scene: ShardedScene, batch: RayBatch):
        key, sub = jax.random.split(state.key)
        grads, total, items = grads_sm(state.params, scene, batch, sub)
        grads["points"] = apply_grad_flags(grads["points"], cfg.points)
        updates, new_opt = alternated_update(tx, grads, state.opt_state,
                                             state.params, state.step,
                                             cfg.train.alter_step)
        new_params = optax.apply_updates(state.params, updates)
        items["loss_total"] = total
        items["psnr"] = mse2psnr(items.pop("mse"))
        return TrainState(params=new_params, opt_state=new_opt,
                          step=state.step + 1, key=key), items

    return step


def make_sharded_eval_step(cfg: PointNeRFConfig, mesh: Mesh,
                           prob: bool = False):
    """Jitted multi-chip inference: returns the full RenderOutput with the ray
    axis re-assembled across (dp, mp)."""
    dp, mp = mesh.shape["dp"], mesh.shape["mp"]

    def device_eval(params, scene: ShardedScene, batch: RayBatch):
        grid = _local_grid(scene)
        pc_local = _squeeze0(params["points"])
        out, _gt = _render_local(params["mlp"], pc_local, grid,
                                 scene.num_active[0], scene.Rw2c, batch, cfg,
                                 key=None, train=False, mp=mp, prob=prob)
        # the per-shard overflow scalar can't ride the ray-sharded out_specs;
        # drivers read it from the training items instead (single-chip-only
        # fields stripped likewise; the hybrid outputs ride when enabled)
        return out._replace(decode_dropped=None, sample_features=None)

    # Spec tree must mirror the output: None in the slots the sharded eval
    # never populates (None is an empty subtree on both sides). Name-based
    # so new RenderOutput fields default to None here instead of silently
    # shifting a positional spec list. fine_raycolor is ray-sharded when
    # hierarchical refinement is on (_fine_local), absent otherwise (the
    # prob path shades coarse-only). neighbor_pidx / fine_neighbor_pidx are
    # always None here (ids are shard-local; per-point hit counters live on
    # the single-chip step).
    fine_on = cfg.render.fine_sample_num > 0 and not prob
    sharded = P(("dp", "mp"))
    core = ("coarse_raycolor", "coarse_is_background", "coarse_depth",
            "coarse_point_opacity", "queried_shading", "ray_mask", "weight",
            "conf_coefficient", "ray_valid", "sample_loc_w")
    probf = ("ray_max_shading_opacity", "ray_max_sample_loc_w",
             "ray_max_far_dist", "shading_avg_color", "shading_avg_dir",
             "shading_avg_conf", "shading_avg_embedding")
    spec = {f: None for f in RenderOutput._fields}
    spec.update({f: sharded for f in core})
    if prob:
        spec.update({f: sharded for f in probf})
    if fine_on:
        spec["fine_raycolor"] = sharded
    if cfg.render.nerf_importance > 0:
        spec.update({f: sharded for f in
                     ("nerf_coarse_raycolor", "nerf_mass", "nerf_loc_w",
                      "nerf_color")})
    out_specs = RenderOutput(**spec)
    eval_sm = jax.shard_map(
        device_eval, mesh=mesh,
        in_specs=({"mlp": P(), "points": P("mp")},
                  scene_specs(cfg.query.prebuild_neighbors),
                  RayBatch(campos=P(), camrotc2w=P(), raydir=P("dp"),
                           pixel_idx=P("dp"), near=P(), far=P(),
                           gt_image=P("dp"))),
        out_specs=out_specs, check_vma=False)

    @jax.jit
    def step(params, scene: ShardedScene, batch: RayBatch):
        if batch.gt_image is None:
            batch = batch._replace(
                gt_image=jnp.zeros((batch.raydir.shape[0], 3), jnp.float32))
        return eval_sm(params, scene, batch)

    return step


def make_sharded_neural2d_step(cfg: PointNeRFConfig, mesh: Mesh, head,
                               patch: int):
    """2D neural-render head training on the (dp, mp) mesh (CNN recon path).

    Mesh analog of the reference's DDP-wrapped head training
    (train_ddp.py:747-804: each rank renders its own feature patch and runs
    its replicated head copy): each dp row owns ONE whole patch^2 feature
    patch (the CNN must see the full patch to convolve), mp shards the
    points. Per-device rendering covers patch^2/mp rays; the head input is
    assembled with a tiled `all_gather` over mp whose transpose hands each
    point shard exactly its own ray block's cotangent (summed over the mp
    redundant head/loss evaluations — hence the same pmean normalizations
    as make_sharded_train_step: the mp-fold cotangent redundancy cancels
    against the mp-fold pmean).

    head params are replicated; optimizer = train/neural2d
    make_neural2d_optimizer (per-group Adam, labels by top-level key)."""
    from ..train.neural2d import Neural2DState, make_neural2d_optimizer
    dp, mp = mesh.shape["dp"], mesh.shape["mp"]
    tx = make_neural2d_optimizer(cfg)
    C = cfg.agg.shading_color_channel_num

    def device_grads(params, scene: ShardedScene, batch: RayBatch,
                     gt_rgb, key):
        grid = _local_grid(scene)

        def local_loss(p):
            pc_local = freeze_points(_squeeze0(p["points"]), cfg.points)
            out, _ = _render_local(p["mlp"], pc_local, grid,
                                   scene.num_active[0], scene.Rw2c, batch,
                                   cfg, key, train=True, mp=mp)
            full = jax.lax.all_gather(out.coarse_raycolor, "mp",
                                      axis=0, tiled=True)     # [patch^2, C]
            feat_img = full.reshape(1, patch, patch, C)
            rgb = head.apply({"params": p["head"]}, feat_img)[0]
            loss = jnp.mean((rgb - gt_rgb[0]) ** 2)
            return loss, {"loss_total": loss}

        (loss, items), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        # Normalization mirrors make_sharded_train_step.device_grads: the
        # all_gather transpose sums the mp shards' (identical) cotangents,
        # so pmean over mp recovers the true per-patch gradient; pmean over
        # dp averages over the dp distinct patches. Direct head grads are
        # identical on every shard, so the same pmean is a no-op for them.
        g_mlp = jax.tree.map(lambda g: jax.lax.pmean(g, ("dp", "mp")),
                             grads["mlp"])
        g_head = jax.tree.map(lambda g: jax.lax.pmean(g, ("dp", "mp")),
                              grads["head"])
        g_pts = jax.tree.map(lambda g: jax.lax.pmean(g, "dp") / mp,
                             grads["points"])
        loss = jax.lax.pmean(loss, ("dp", "mp"))
        items = jax.tree.map(lambda v: jax.lax.pmean(v, ("dp", "mp")), items)
        return {"mlp": g_mlp, "points": g_pts, "head": g_head}, loss, items

    grads_sm = jax.shard_map(
        device_grads, mesh=mesh,
        in_specs=({"mlp": P(), "points": P("mp"), "head": P()},
                  scene_specs(cfg.query.prebuild_neighbors),
                  RayBatch(campos=P(), camrotc2w=P(), raydir=P("dp"),
                           pixel_idx=P("dp"), near=P(), far=P(),
                           gt_image=P("dp")),
                  P("dp"), P()),
        out_specs=({"mlp": P(), "points": P("mp"), "head": P()}, P(), P()),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, scene: ShardedScene, batch: RayBatch, gt_rgb):
        key, sub = jax.random.split(state.key)
        if batch.gt_image is None:
            batch = batch._replace(
                gt_image=jnp.zeros((batch.raydir.shape[0], 3), jnp.float32))
        grads, loss, items = grads_sm(state.params, scene, batch, gt_rgb,
                                      sub)
        grads["points"] = apply_grad_flags(grads["points"], cfg.points)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        items["psnr"] = mse2psnr(items["loss_total"])
        return Neural2DState(params=new_params, opt_state=new_opt,
                             step=state.step + 1, key=key), items

    return step


def create_sharded_neural2d_state(key, agg_params, pc: PointCloud,
                                  head_params, scene: ShardedScene,
                                  cfg: PointNeRFConfig, mesh: Mesh):
    """Mesh-placed Neural2DState: points mp-sharded, mlp + head replicated,
    optimizer initialized under jit so Adam moments inherit shardings."""
    from ..train.neural2d import Neural2DState, make_neural2d_optimizer

    def put(tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec_tree)

    params = {"mlp": agg_params, "points": pc, "head": head_params}
    pspec = {"mlp": jax.tree.map(lambda _: P(), agg_params),
             "points": jax.tree.map(lambda _: P("mp"), pc),
             "head": jax.tree.map(lambda _: P(), head_params)}
    params = put(params, pspec)
    scene2 = put(scene, scene_specs(scene.vox_dslot is not None))
    tx = make_neural2d_optimizer(cfg)
    opt_state = jax.jit(tx.init)(params)
    rep = NamedSharding(mesh, P())
    return Neural2DState(params=params, opt_state=opt_state,
                         step=jax.device_put(jnp.asarray(0, jnp.int32), rep),
                         key=jax.device_put(key, rep)), scene2


def _place_opt_state(opt_state, mesh: Mesh, cap: int):
    """Re-place optimizer state on the mesh: per-point moment leaves (leading
    [mp, cap] axes) sharded over mp, everything else replicated. Host-side
    repacks (vmap / jnp.concatenate) can silently drop shardings; without
    this the per-point Adam moments would replicate across devices and
    defeat the memory scaling that motivates mp-sharding."""
    mp = mesh.shape["mp"]

    def put(x):
        if (hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[:2] == (mp, cap)):
            spec = P("mp")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, opt_state)


def sharded_prune(state: TrainState, scene: ShardedScene,
                  cfg: PointNeRFConfig, mesh: Mesh
                  ) -> Tuple[TrainState, ShardedScene, int]:
    """Confidence pruning on the sharded cloud: each shard packs its own
    survivors (vmapped models.points.prune over the mp axis), grids are
    rebuilt, and the per-shard Adam moments are carried through the repack
    (permuted with the pack order, dead tail zeroed — same moment-carry
    semantics as the single-device apply_prune, train/grow.py). The
    reference DDP path instead rebuilds its optimizers after pruning
    (train_ddp.py:913-937), losing all moment state."""
    from ..models.points import prune as _prune

    pc: PointCloud = state.params["points"]          # [mp, cap, ...]

    def one(pc_s, n_s):
        pc2, st2, kept, order = _prune(
            pc_s, PointCloudStatic(num_active=n_s, Rw2c=scene.Rw2c),
            cfg.train.prune_thresh, return_order=True)
        return pc2, kept, order

    pc2, kept, orders = jax.vmap(one)(pc, scene.num_active)
    num_active = kept.astype(jnp.int32)
    from ..config import jit_canonical
    scene2 = build_sharded_scene(pc2, num_active, jit_canonical(cfg), mesh,
                                 Rw2c=scene.Rw2c)
    params = dict(state.params, points=pc2)

    # carry Adam moments through the per-shard repack (see
    # train/grow.py permute_point_opt_state)
    cap = jax.tree.leaves(pc)[0].shape[1]

    def per_shard(xs, o, k):
        out = xs[o]
        dead = jnp.arange(cap) >= k
        return jnp.where(dead.reshape((-1,) + (1,) * (xs.ndim - 1)), 0.0,
                         out)

    def visit(x):
        if (hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[:2] == (mesh.shape["mp"], cap)):
            return jax.vmap(per_shard)(x, orders, kept)
        return x
    opt_state = _place_opt_state(jax.tree.map(visit, state.opt_state),
                                 mesh, cap)
    # re-place params on the mesh (vmap output may lose shardings)
    def put(tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec_tree)
    pspec = {"mlp": jax.tree.map(lambda _: P(), params["mlp"]),
             "points": jax.tree.map(lambda _: P("mp"), pc2)}
    new_state = TrainState(params=put(params, pspec), opt_state=opt_state,
                           step=state.step, key=state.key)
    return new_state, scene2, int(jnp.sum(kept))


def sharded_grow(state: TrainState, scene: ShardedScene, cand,
                 cfg: PointNeRFConfig, mesh: Mesh
                 ) -> Tuple[TrainState, ShardedScene, int]:
    """Append probe candidates round-robin across point shards (same
    balance rule as partition_points) and rebuild grids + Adam state."""
    from ..models.points import grow as _grow
    from ..train.grow import ProbeCandidates

    mp = mesh.shape["mp"]
    pc: PointCloud = state.params["points"]
    opt_state = state.opt_state
    m = cand.xyz.shape[0]
    per = [np.arange(j, m, mp) for j in range(mp)]
    width = max((len(p) for p in per), default=0)

    def pad_shard(a, sel, fill):
        out = np.full((width,) + a.shape[1:], fill, np.float32)
        out[: len(sel)] = a[sel]
        return out

    # re-bucket every shard to a common larger capacity if any would
    # overflow (grow() drops overflow; the single-device apply_grow
    # re-buckets the same way)
    cap = jax.tree.leaves(pc)[0].shape[1]
    needed = int(jnp.max(scene.num_active)) + width
    if needed > cap:
        new_cap = round_capacity(needed)

        def repad(x):
            fill = DEAD_XYZ if x is pc.xyz else 0.0
            out = jnp.full((mp, new_cap) + x.shape[2:], fill, x.dtype)
            return out.at[:, : x.shape[1]].set(x)
        old_pc = pc
        pc = PointCloud(xyz=repad(old_pc.xyz), features=repad(old_pc.features),
                        conf=repad(old_pc.conf), color=repad(old_pc.color),
                        dirs=repad(old_pc.dirs))

        def pad_visit(x):
            if (hasattr(x, "ndim") and x.ndim >= 2
                    and x.shape[:2] == (mp, cap)):
                padz = jnp.zeros((mp, new_cap - cap) + x.shape[2:], x.dtype)
                return jnp.concatenate([x, padz], axis=1)
            return x
        opt_state = jax.tree.map(pad_visit, opt_state)

    shards_pc, counts = [], []
    for j in range(mp):
        pc_j = jax.tree.map(lambda x: x[j], pc)
        st_j = PointCloudStatic(num_active=scene.num_active[j],
                                Rw2c=scene.Rw2c)
        if width:
            pc_j, st_j, _added = _grow(
                pc_j, st_j,
                jnp.asarray(pad_shard(cand.xyz, per[j], DEAD_XYZ)),
                jnp.asarray(pad_shard(cand.embedding, per[j], 0.0)),
                jnp.asarray(pad_shard(cand.conf, per[j], 0.0)),
                jnp.asarray(pad_shard(cand.color, per[j], 0.0)),
                jnp.asarray(pad_shard(cand.dirs, per[j], 0.0)))
        shards_pc.append(pc_j)
        counts.append(st_j.num_active)
    pc2 = jax.tree.map(lambda *xs: jnp.stack(xs), *shards_pc)
    num_active = jnp.stack(counts).astype(jnp.int32)
    from ..config import jit_canonical
    scene2 = build_sharded_scene(pc2, num_active, jit_canonical(cfg), mesh,
                                 Rw2c=scene.Rw2c)
    params = dict(state.params, points=pc2)
    # opt_state carried (padded above if re-bucketed): grown slots start
    # with exact zero moments
    opt_state = _place_opt_state(opt_state, mesh,
                                 jax.tree.leaves(pc2)[0].shape[1])
    def put(tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec_tree)
    pspec = {"mlp": jax.tree.map(lambda _: P(), params["mlp"]),
             "points": jax.tree.map(lambda _: P("mp"), pc2)}
    new_state = TrainState(params=put(params, pspec), opt_state=opt_state,
                           step=state.step, key=state.key)
    added = int(jnp.sum(num_active) - jnp.sum(scene.num_active))
    return new_state, scene2, added


def create_sharded_train_state(key, agg_params, pc: PointCloud,
                               scene: ShardedScene, cfg: PointNeRFConfig,
                               mesh: Mesh) -> Tuple[TrainState, ShardedScene]:
    """Place params/scene on the mesh and init the optimizer *under jit* so
    the Adam state inherits the param shardings (mp-sharded point moments,
    replicated MLP moments) through XLA sharding propagation."""
    def put(tree, spec_tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec_tree)

    params = {"mlp": agg_params, "points": pc}
    pspec = {"mlp": jax.tree.map(lambda _: P(), agg_params),
             "points": jax.tree.map(lambda _: P("mp"), pc)}
    params = put(params, pspec)
    scene2 = put(scene, scene_specs(scene.vox_dslot is not None))
    tx = make_optimizer(cfg)
    opt_state = jax.jit(tx.init)(params)
    rep = NamedSharding(mesh, P())
    return TrainState(params=params, opt_state=opt_state,
                      step=jax.device_put(jnp.asarray(0, jnp.int32), rep),
                      key=jax.device_put(key, rep)), scene2
