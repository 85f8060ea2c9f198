"""Ray sampling, shading-point selection, and K-nearest-neighbor point query.

TPU-native replacement for the reference CUDA query pipeline
(models/neural_points/query_point_indices_worldcoords.py:84-99, 390-527,
614-721). Two deliberate design translations (SURVEY.md §7):

 - STATIC SHAPES: the reference compacts rays to the dynamic hit count R'
   (:655-661) as a CUDA memory optimization; we keep all R rays and carry
   `ray_mask` / `sample_mask` through aggregation and the loss instead.
 - SORT/CUMSUM instead of atomics: shading-slot assignment uses the same
   cumsum trick as the reference (:664-665) but stays fully vectorized.

The KNN emulates the CUDA layered shell search exactly in `shell_layered`
mode: all candidates from complete shells up to the first shell where the
running in-radius count reaches K participate; the K nearest of those are
kept (query_neigh_along_ray_layered :479-527). With shell_layered=False a
plain top-K over the full kernel neighborhood is used (strictly better
neighbor quality; default for training from scratch).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QueryConfig
from .grid import GridMeta, PointGrid, flat_vid, grid_meta, voxel_coords


def _mix_u32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 integer finalizer: uniform u32 avalanche of a u32 input
    (used for the NN=0 random-subset keys; uint mults wrap mod 2^32)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


# --------------------------------------------------------------------------
# Ray generation (models/rendering/diff_ray_marching.py:349-393, 201-249)
# --------------------------------------------------------------------------

def near_far_linear_ray_generation(campos, raydir, point_count: int, near, far,
                                   jitter: float = 0.0, key=None):
    """Uniform-in-depth ray samples with jittered segment lengths.

    campos: [3]; raydir: [R, 3]. Returns (raypos [R,D,3], seglen [R,D],
    tvals [R,D]) — midpoint sampling, matching diff_ray_marching.py:349-393.
    """
    R = raydir.shape[0]
    D = point_count
    t = jnp.linspace(0.0, 1.0, D + 1, dtype=jnp.float32)
    tvals = near * (1.0 - t) + far * t                       # [D+1]
    seg = tvals[1:] - tvals[:-1]                             # [D]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (R, D), dtype=jnp.float32)
        seg = seg[None, :] * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(seg[None, :], (R, D))
    end = near + jnp.cumsum(seg, axis=-1)                    # [R, D]
    end = jnp.concatenate([jnp.full((R, 1), near, jnp.float32), end], axis=-1)
    mid = 0.5 * (end[:, :-1] + end[:, 1:])                   # [R, D]
    raypos = campos[None, None, :] + raydir[:, None, :] * mid[..., None]
    seglen = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seglen, mid


def near_far_disparity_linear_ray_generation(campos, raydir, point_count: int,
                                             near, far, jitter: float = 0.0,
                                             key=None):
    """Uniform-in-disparity samples (diff_ray_marching.py:201-249)."""
    R = raydir.shape[0]
    D = point_count
    t = jnp.linspace(0.0, 1.0, D + 1, dtype=jnp.float32)
    tvals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)   # [D+1]
    tvals = jnp.broadcast_to(tvals[None, :], (R, D + 1))
    if jitter > 0.0 and key is not None:
        mids = 0.5 * (tvals[:, 1:] + tvals[:, :-1])
        upper = jnp.concatenate([mids, tvals[:, -1:]], axis=-1)
        lower = jnp.concatenate([tvals[:, :1], mids], axis=-1)
        u = jax.random.uniform(key, (R, D + 1), dtype=jnp.float32)
        tvals = lower + (upper - lower) * u
    mid = 0.5 * (tvals[:, :-1] + tvals[:, 1:])
    seglen = (tvals[:, 1:] - tvals[:, :-1]) * jnp.linalg.norm(
        raydir, axis=-1, keepdims=True)
    raypos = campos[None, None, :] + raydir[:, None, :] * mid[..., None]
    return raypos, seglen, mid


def near_middle_far_ray_generation(campos, raydir, point_count: int, near, far,
                                   jitter: float = 0.0, key=None,
                                   middle: float = 2.0,
                                   middle_split: float = 0.6):
    """Linear near->middle, disparity middle->far (diff_ray_marching.py
    :142-198): dense coverage of the foreground with 1/z falloff behind."""
    R = raydir.shape[0]
    D = point_count
    n0 = int(D * middle_split) + 1
    n1 = int(D * (1.0 - middle_split)) + 2
    t0 = jnp.linspace(0.0, 1.0, n0, dtype=jnp.float32)
    vals0 = near * (1.0 - t0) + middle * t0
    t1 = jnp.linspace(0.0, 1.0, n1, dtype=jnp.float32)
    vals1 = 1.0 / (1.0 / middle * (1.0 - t1) + 1.0 / far * t1)
    tvals = jnp.concatenate([vals0, vals1])                  # [n0+n1]
    seg = tvals[1:] - tvals[:-1]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (R, seg.shape[0]), dtype=jnp.float32)
        seg = seg[None, :] * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(seg[None, :], (R, seg.shape[0]))
    # NOTE: truncating to D segments drops the deepest 1-2 disparity segments
    # (samples never quite reach `far`) and keeps a zero-length segment at the
    # linear/disparity junction. This reproduces the reference bit-for-bit —
    # it builds int(D*s)+int(D*(1-s))+2 boundaries and slices
    # `segment_length[..., :point_count]` the same way
    # (diff_ray_marching.py:164-181).
    seg = seg[:, :D]                                         # [R, D]
    end = near + jnp.cumsum(seg, axis=-1)
    end = jnp.concatenate([jnp.full((R, 1), near, jnp.float32), end], axis=-1)
    mid = 0.5 * (end[:, :-1] + end[:, 1:])
    raypos = campos[None, None, :] + raydir[:, None, :] * mid[..., None]
    return raypos, seg, mid


def _nerf_stratified(tvals, R: int, jitter: float, key):
    """NeRF's stratified bin jitter (diff_ray_marching.py:276-281)."""
    if jitter > 0.0 and key is not None:
        mids = 0.5 * (tvals[1:] + tvals[:-1])
        upper = jnp.concatenate([mids, tvals[-1:]])
        lower = jnp.concatenate([tvals[:1], mids])
        u = jax.random.uniform(key, (R, tvals.shape[0]), dtype=jnp.float32)
        return lower[None] + (upper - lower)[None] * u
    return jnp.broadcast_to(tvals[None, :], (R, tvals.shape[0]))


def nerf_near_far_linear_ray_generation(campos, raydir, point_count: int,
                                        near, far, jitter: float = 0.0,
                                        key=None):
    """NeRF-style sampling AT the (stratified) bin values, last segment open
    (1e10) — diff_ray_marching.py:303-345. Samples sit at tvals, not segment
    midpoints."""
    R = raydir.shape[0]
    t = jnp.linspace(0.0, 1.0, point_count, dtype=jnp.float32)
    tvals = _nerf_stratified(near * (1.0 - t) + far * t, R, jitter, key)
    seg = jnp.concatenate(
        [tvals[:, 1:] - tvals[:, :-1],
         jnp.full((R, 1), 1e10, jnp.float32)], axis=-1)
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    raypos = campos[None, None, :] + raydir[:, None, :] * tvals[..., None]
    return raypos, seg, tvals


def nerf_near_far_disparity_linear_ray_generation(campos, raydir,
                                                  point_count: int, near, far,
                                                  jitter: float = 0.0,
                                                  key=None):
    """NeRF sampling uniform in disparity (diff_ray_marching.py:252-300)."""
    R = raydir.shape[0]
    t = jnp.linspace(0.0, 1.0, point_count, dtype=jnp.float32)
    base = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    tvals = _nerf_stratified(base, R, jitter, key)
    seg = jnp.concatenate(
        [tvals[:, 1:] - tvals[:, :-1],
         jnp.full((R, 1), 1e10, jnp.float32)], axis=-1)
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    raypos = campos[None, None, :] + raydir[:, None, :] * tvals[..., None]
    return raypos, seg, tvals


def sample_pdf(ts, weights, n_samples: int, det: bool = True, key=None):
    """Inverse-CDF importance sampling of new bin edges, then merge+sort with
    the old ones (diff_ray_marching.py:36-83, NeRF hierarchical sampling).

    ts: [R, S] previous sample parameters; weights: [R, S] blend weights.
    Returns [R, n_samples + S] sorted ts. The reference round-trips through
    numpy + a per-ray python searchsorted loop; here the CDF inversion is a
    dense [R, n, S-1] comparison-count — static shapes, jit/TPU friendly.
    """
    R, S = ts.shape
    bins = 0.5 * (ts[:, 1:] + ts[:, :-1])                    # [R, S-1]
    w = weights[:, 1:-1] + 1e-5                              # [R, S-2]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R, S-1]

    if det or key is None:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32),
            (R, n_samples))
    else:
        u = jax.random.uniform(key, (R, n_samples), dtype=jnp.float32)

    # searchsorted(side='right') as a dense comparison count (vmapped
    # searchsorted lowers to a serial while loop on TPU)
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1,
                   dtype=jnp.int32)                          # [R, n]
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = jnp.take_along_axis(cdf, below, axis=1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=1)
    bin_b = jnp.take_along_axis(bins, below, axis=1)
    bin_a = jnp.take_along_axis(bins, above, axis=1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    frac = (u - cdf_b) / denom
    samples = bin_b + frac * (bin_a - bin_b)                 # [R, n]
    merged = jnp.concatenate([samples, jax.lax.stop_gradient(ts)], axis=-1)
    return jnp.sort(merged, axis=-1)


def refine_ray_generation(campos, raydir, point_count: int, prev_ts,
                          prev_weights, jitter: float = 0.0, key=None):
    """Importance-refined ray samples from a previous pass's blend weights
    (diff_ray_marching.py:396-433): sample_pdf new bin EDGES, midpoint
    positions. Returns (raypos [R, D', 3], seglen [R, D'], mid [R, D'])
    where D' = point_count + prev_ts.shape[1]."""
    end = sample_pdf(prev_ts, prev_weights, point_count + 1,
                     det=jitter <= 0.0, key=key)             # [R, pc+1+S]
    end = jax.lax.stop_gradient(end)
    seg = end[:, 1:] - end[:, :-1]
    mid = 0.5 * (end[:, :-1] + end[:, 1:])
    raypos = campos[None, None, :] + raydir[:, None, :] * mid[..., None]
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seg, mid


RAY_GENERATORS = {
    "near_far_linear": near_far_linear_ray_generation,
    "near_far_disparity_linear": near_far_disparity_linear_ray_generation,
    "near_middle_far": near_middle_far_ray_generation,
    "nerf_near_far_linear": nerf_near_far_linear_ray_generation,
    "nerf_near_far_disparity_linear": nerf_near_far_disparity_linear_ray_generation,
}


# --------------------------------------------------------------------------
# Shading-point selection
# --------------------------------------------------------------------------

class QueryResult(NamedTuple):
    sample_pidx: jnp.ndarray     # [R, SR, K] int32, -1 invalid
    sample_loc_w: jnp.ndarray    # [R, SR, 3] world shading locations
    sample_mask: jnp.ndarray     # [R, SR] bool — slot holds a shading point
    ray_mask: jnp.ndarray        # [R] bool — ray has >=1 neighbor-bearing point


def select_shading_points(raypos: jnp.ndarray, grid: PointGrid, meta: GridMeta,
                          SR: int, tvals: Optional[jnp.ndarray] = None,
                          campos: Optional[jnp.ndarray] = None,
                          raydir: Optional[jnp.ndarray] = None,
                          select: str = "sort"):
    """Pick the first SR ray samples that land in occupied (dilated) voxels.

    Matches mask_raypos (:390-414) + the cumsum compaction (:664-665) +
    get_shadingloc (:417-439), with static shapes.
    raypos: [R, D, 3] -> (sample_loc_w [R,SR,3], sample_mask [R,SR]).
    """
    R, D, _ = raypos.shape
    G = meta.num_cells
    coor = voxel_coords(raypos, meta)
    vid, inb = flat_vid(coor, meta)                      # [R, D]

    # Three equivalent formulations pick the first SR hit positions per ray
    # in depth order (select via QueryConfig.slot_select):
    #  - "merge" (default): zero occupancy-table gathers. A per-element
    #    [R, D] gather costs ~7.6 ns/row on this chip (11 ms/step at the
    #    lego budget) while lax.sort moves the same elements ~10x cheaper,
    #    so membership is computed by SORTING the occupied-cell list
    #    together with the sample vids: occupied cells get even keys 2*vid,
    #    samples odd keys 2*vid+1; after one 2-operand sort, a cummax of
    #    the even keys tells each sample whether its own cell is occupied
    #    (run == key-1). A second 1-operand sort of
    #    key2 = ray*2D + (hit ? d : D+d) lands each ray's D entries in a
    #    contiguous block (key ranges are disjoint per ray), hits first in
    #    depth order — the first SR of each block ARE the slot indices.
    #  - "sort": gather dilated occupancy at each sample, then key = d for
    #    hits / D + d for misses; one ascending [R, D] i32 sort packs hits
    #    to the front. (Replaced the round-1 dense [R, SR, D]
    #    comparison-sum — a 115M-element intermediate; vmapped
    #    searchsorted is worse still, lowering to a serial loop.)
    #  - "scatter": rank = exclusive cumsum of hits; each hit scatters its
    #    depth index into dense slot `rank` (unique destinations, misses
    #    dropped). One linear pass instead of ~log^2(D) bitonic stages.
    # All three produce identical (sample_loc_w, sample_mask); "merge"
    # additionally requires the dilated-occupied cell count to fit max_d
    # (the same envelope the prebuilt neighbor tables need).
    d_ar = jnp.arange(D, dtype=jnp.int32)[None, :]
    if select == "merge":
        assert grid.occ_vids is not None, \
            "slot_select='merge' needs PointGrid.occ_vids"
        S = grid.occ_vids
        ns = S.shape[0]
        RD = R * D
        # OOB samples: key 2G+2 matches nothing (valid sample keys <= 2G-1,
        # occupied keys even, padding G -> 2G); being even it reads as an
        # "occupied" entry, which only raises `run` for later OOB samples.
        mkey_q = jnp.where(inb, vid * 2 + 1, 2 * G + 2).reshape(-1)
        keys = jnp.concatenate([S * 2, mkey_q])
        lanes = jnp.concatenate([RD + jnp.arange(ns, dtype=jnp.int32),
                                 jnp.arange(RD, dtype=jnp.int32)])
        # is_stable=False: XLA's stable sort appends an iota tie-break
        # operand — a full extra payload pass over 1.57M elements. Equal
        # keys here are only occ-occ duplicates (identical effect on `run`)
        # or same-vid samples (each lane's (r,d) is recovered from its own
        # payload and re-ordered by the unique-key second sort), so any
        # order among ties yields the identical result.
        if tvals is not None:
            # carry the scalar ray parameter as a sort payload: sorts move
            # elements ~10x cheaper than the [R, SR] take_along_axis gather
            # this replaces (2.8 ms/step at the lego budget)
            tpay = jnp.concatenate([jnp.zeros((ns,), tvals.dtype),
                                    tvals.reshape(-1)])
            ks, ls, tsort = jax.lax.sort((keys, lanes, tpay), num_keys=1,
                                         is_stable=False)
        else:
            ks, ls = jax.lax.sort((keys, lanes), num_keys=1, is_stable=False)
            tsort = None
        is_occ = (ks & 1) == 0
        run = jax.lax.cummax(jnp.where(is_occ, ks, -1))
        hit_s = (~is_occ) & (run == ks - 1)
        r_ = ls // D
        d_ = ls % D
        # occupied-list lanes have r_ >= R: they sort past every ray block
        key2 = r_ * (2 * D) + jnp.where(hit_s, d_, D + d_)
        # key2 is globally unique ((r_, d_) distinct per lane), so the
        # stable sort's implicit iota payload is pure waste
        if tsort is not None:
            k2, tsel = jax.lax.sort((key2, tsort), num_keys=1,
                                    is_stable=False)
            tsel = tsel[:RD].reshape(R, D)[:, :SR]       # [R, SR]
        else:
            k2 = jax.lax.sort(key2, is_stable=False)
            tsel = None
        blk = k2[:RD].reshape(R, D)[:, :SR]
        idx = blk - (jnp.arange(R, dtype=jnp.int32) * 2 * D)[:, None]
        sample_mask = idx < D
        idx = jnp.where(sample_mask, idx, idx - D)       # miss: original d
    else:
        tsel = None
        occ = grid.vox_occ[jnp.minimum(vid, grid.vox_occ.shape[0] - 1)]
        hit = inb & (occ > 0)                            # [R, D]
        if select == "scatter":
            rank = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1    # [R, D]
            sel = hit & (rank < SR)
            # distinct out-of-bounds destinations for dropped lanes
            dst = jnp.where(sel, rank, SR + d_ar)
            R_ = raypos.shape[0]
            idx = jnp.full((R_, SR), D, jnp.int32).at[
                jnp.arange(R_)[:, None], dst].set(
                    jnp.broadcast_to(d_ar, (R_, D)), mode="drop",
                    unique_indices=True)
        else:
            key = jnp.where(hit, d_ar, D + d_ar)         # [R, D]
            idx = jax.lax.sort(key, dimension=-1)[:, :SR]  # [R, SR]
        sample_mask = idx < D                            # slot exists
    idx = jnp.minimum(idx, D - 1)
    if tvals is not None:
        # the scalar ray parameter (sort-carried on the merge path; a
        # 1-float-per-slot gather otherwise) rebuilds the position
        t = (tsel if tsel is not None
             else jnp.take_along_axis(tvals, idx, axis=1))  # [R, SR]
        sample_loc_w = campos[None, None, :] + raydir[:, None, :] * t[..., None]
    else:
        sample_loc_w = jnp.take_along_axis(raypos, idx[..., None], axis=1)
    sample_loc_w = jnp.where(sample_mask[..., None], sample_loc_w, 0.0)
    return sample_loc_w, sample_mask


# --------------------------------------------------------------------------
# KNN over the voxel neighborhood
# --------------------------------------------------------------------------

def _kernel_offsets(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    """Neighbor-voxel offsets for the shell search, ordered by shell layer
    (query_neigh_along_ray_layered :482-489 scans layer = max(|x|,|y|,|z|)).
    Shared with the prebuilt neighbor-table layout (ops/grid.py)."""
    from .grid import kernel_offsets_layered
    return kernel_offsets_layered(kernel_size)


def _topk_argmin(d2: jnp.ndarray, pid: jnp.ndarray, K: int):
    """K smallest (d2, pid) per row via K argmin+mask sweeps (ascending,
    first-occurrence tie-break — matches the two-operand sort selection).
    d2 [C, M] f32 with inf for invalid; pid [C, M] i32."""
    C, M = d2.shape
    cols = jnp.arange(M, dtype=jnp.int32)[None, :]
    tp, td = [], []
    for _ in range(K):
        i = jnp.argmin(d2, axis=-1)                         # [C]
        td.append(jnp.take_along_axis(d2, i[:, None], axis=-1)[:, 0])
        tp.append(jnp.take_along_axis(pid, i[:, None], axis=-1)[:, 0])
        d2 = jnp.where(cols == i[:, None], jnp.inf, d2)
    return jnp.stack(tp, axis=-1), jnp.stack(td, axis=-1)


def _knn_chunk(centers, center_valid, xyz, grid, meta, cfg: QueryConfig):
    """KNN for a chunk of shading points.

    centers: [C, 3]; center_valid: [C] bool.
    Returns (pidx [C, K] int32 -1-padded, d2 [C, K]).
    """
    C = centers.shape[0]
    K, P = cfg.K, cfg.P
    offs, layer = _kernel_offsets(cfg.kernel_size)
    Q = offs.shape[0]
    offs_j = jnp.asarray(offs)
    layer_j = jnp.asarray(layer)                          # [Q]
    G1 = grid.vox_slot.shape[0] - 1

    ccoor = voxel_coords(centers, meta)                   # [C, 3]
    if grid.nbr_xyz is not None:
        # FAST PATH: one streaming [Q*P, 3] row per center from the prebuilt
        # per-dilated-voxel candidate table (see ops/grid.py).
        cvid, cinb = flat_vid(ccoor, meta)                # [C]
        dslot = jnp.where(cinb, grid.vox_dslot[jnp.minimum(cvid, G1)], -1)
        dsc = jnp.maximum(dslot, 0)
        if cfg.knn_select == "pallas" and cfg.NN > 0 and not cfg.shell_layered:
            # Fused Pallas distance+selection: one VMEM pass over the
            # gathered candidate tile instead of an HBM d2 block + sort /
            # argmin sweeps (ops/pallas_knn.py). Identical winner set.
            from .pallas_knn import pallas_knn_select
            return pallas_knn_select(
                jnp.swapaxes(grid.nbr_xyz[dsc].reshape(C, 3, Q * P), 1, 2),
                grid.nbr_pid[dsc], centers,
                (dslot >= 0) & center_valid, K=K,
                r2=cfg.radius_limit ** 2)
        # flat coordinate-major rows [3*Q*P] (see ops/grid.py) — the three
        # coordinate blocks are LANE SLICES, so the distance reduction
        # needs no reshape and therefore no retiling copy of the gathered
        # block
        QP = Q * P
        row = grid.nbr_xyz[dsc]                           # [C, 3*QP]

        def _sq(i):
            dv = row[:, i * QP:(i + 1) * QP] - centers[:, i:i + 1]
            return dv * dv

        d2 = (_sq(0) + _sq(1) + _sq(2)).reshape(C, Q, P)
        cand_ok = ((dslot >= 0) & center_valid)[:, None, None] & \
            (row[:, :QP] < 1.0e7).reshape(C, Q, P)        # dead slots = 1e8
    else:
        ncoor = ccoor[:, None, :] + offs_j[None, :, :]    # [C, Q, 3]
        nvid, ninb = flat_vid(ncoor, meta)
        slot = jnp.where(ninb, grid.vox_slot[jnp.minimum(nvid, G1)], -1)
        has = slot >= 0                                   # [C, Q]
        slot_c = jnp.where(has, slot, 0)
        # Candidate positions from the bucket-major copy: one contiguous
        # [P,3] row per neighbor voxel (vs P scattered point gathers). Point
        # ids are gathered only for the K winners after top_k.
        pxyz = grid.bucket_xyz[slot_c]                    # [C, Q, P, 3]
        cnt = jnp.where(has, grid.bucket_cnt[slot_c], 0)  # [C, Q]
        in_cnt = jnp.arange(P, dtype=jnp.int32)[None, None, :] < cnt[..., None]
        cand_ok = in_cnt & has[..., None] & center_valid[:, None, None]
        diff = pxyz - centers[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)                # [C, Q, P]

    r2 = cfg.radius_limit ** 2
    if r2 > 0:
        cand_ok = cand_ok & (d2 <= r2)

    if cfg.NN <= 0:
        # NN=0: a UNIFORM RANDOM K-subset of the in-radius candidates instead
        # of the K nearest — the reference's query_rand_along_ray fills the
        # first K then reservoir-samples the rest (query_point_indices.py
        # :416-492, Algorithm R), which is exactly a uniform K-subset. Static
        # equivalent: give every candidate a hash-random key and keep the K
        # smallest. Keys integer-hash (shading-location bits, point id), so
        # they are uniform across the full id range and deterministic per
        # geometry regardless of knn_chunk / compaction layout — where the
        # reference reseeds from wall-clock time (documented deviation;
        # re-jitters every step through ray jitter).
        if grid.nbr_xyz is not None:
            pid_flat = grid.nbr_pid[dsc].reshape(C, Q * P)
        else:
            pid_flat = grid.bucket_pnt[slot_c].reshape(C, Q * P)
        cbits = jax.lax.bitcast_convert_type(centers, jnp.uint32)  # [C,3]
        hc = _mix_u32(cbits[:, 0] ^ _mix_u32(cbits[:, 1]
                                             ^ _mix_u32(cbits[:, 2])))
        keys = _mix_u32(pid_flat.astype(jnp.uint32) ^ hc[:, None])
        big = jnp.uint32(0xFFFFFFFF)
        # >>1 keeps every valid key strictly below the invalid sentinel
        keys = jnp.where(cand_ok.reshape(C, Q * P), keys >> 1, big)
        k_sorted, pid_sorted, d2_sorted = jax.lax.sort(
            (keys, pid_flat, d2.reshape(C, Q * P)), num_keys=1)
        ok = k_sorted[:, :K] < big
        return (jnp.where(ok, pid_sorted[:, :K], -1).astype(jnp.int32),
                jnp.where(ok, d2_sorted[:, :K], jnp.inf))

    if cfg.shell_layered:
        # Include complete shells until the running candidate count reaches K
        # (CUDA kernel breaks after a finished layer once kid >= K, :526).
        n_layers = int(layer.max()) + 1
        lay = jnp.broadcast_to(layer_j[None, :, None], cand_ok.shape)
        counts = []
        for l in range(n_layers):
            counts.append(jnp.sum(cand_ok & (lay <= l), axis=(1, 2)))   # [C]
        counts = jnp.stack(counts, axis=-1)               # [C, n_layers]
        reach = counts >= K
        # first layer reaching K, else last layer
        first = jnp.argmax(reach, axis=-1)
        L = jnp.where(jnp.any(reach, axis=-1), first, n_layers - 1)     # [C]
        cand_ok = cand_ok & (lay <= L[:, None, None])

    d2_flat = jnp.where(cand_ok, d2, jnp.inf).reshape(C, Q * P)
    if grid.nbr_xyz is not None:
        pid_flat = grid.nbr_pid[dsc].reshape(C, Q * P)
        if cfg.knn_select == "argmin":
            # K-pass min-extraction: a full bitonic sort of the [C, Q*P]
            # candidate block moves ~log2(n)*(log2(n)+1) passes of the whole
            # array through HBM (~5.4 GB at the lego budget, the largest
            # single item on the end-to-end roofline); K sequential
            # argmin+mask sweeps move ~K*2 passes (~0.6 GB) and XLA can keep
            # the block VMEM-resident across sweeps. Same result: ascending
            # d2, first-occurrence tie-break.
            top_pid, top_d2 = _topk_argmin(d2_flat, pid_flat, K)
        elif cfg.knn_select == "topk":
            # XLA's native TopK custom call (partial sort) + a [C, K] winner
            # gather: reads the d2 block once and only K pids per row. Ties
            # resolve to the lowest candidate index, same as the stable sort
            # and the argmin sweeps.
            neg, top_i = jax.lax.top_k(-d2_flat, K)        # [C, K]
            top_d2 = -neg
            top_pid = jnp.take_along_axis(pid_flat, top_i, axis=-1)
        else:
            # carry pids through ONE two-operand sort instead of top_k + a
            # separate [C*K]-indexed winner gather (which re-reads the whole
            # [C, Q*P] pid block; the sort costs ~1/4 of that take on
            # profile)
            d2_sorted, pid_sorted = jax.lax.sort((d2_flat, pid_flat),
                                                 num_keys=1)
            top_d2 = d2_sorted[:, :K]
            top_pid = pid_sorted[:, :K]
    else:
        neg, top_i = jax.lax.top_k(-d2_flat, K)           # [C, K]
        top_d2 = -neg
        win_slot = jnp.take_along_axis(slot_c, top_i // P, axis=-1)  # [C, K]
        top_pid = grid.bucket_pnt[win_slot, top_i % P]
    ok = jnp.isfinite(top_d2)
    return jnp.where(ok, top_pid, -1).astype(jnp.int32), jnp.where(ok, top_d2, jnp.inf)


def knn_query(sample_loc_w: jnp.ndarray, sample_mask: jnp.ndarray,
              xyz: jnp.ndarray, grid: PointGrid, cfg: QueryConfig):
    """K nearest neural points for every shading point.

    sample_loc_w: [R, SR, 3]; sample_mask: [R, SR]; xyz: [N, 3].
    Returns sample_pidx [R, SR, K] int32 (-1 invalid).
    Chunked over shading points to bound gather workspace.
    """
    meta = grid_meta(cfg)
    R, SR, _ = sample_loc_w.shape
    flat_c = sample_loc_w.reshape(-1, 3)
    flat_m = sample_mask.reshape(-1)
    total = R * SR
    chunk = min(cfg.knn_chunk, total)
    pad = (-total) % chunk
    if pad:
        flat_c = jnp.concatenate([flat_c, jnp.zeros((pad, 3), flat_c.dtype)])
        flat_m = jnp.concatenate([flat_m, jnp.zeros((pad,), bool)])
    n_chunks = flat_c.shape[0] // chunk
    cs = flat_c.reshape(n_chunks, chunk, 3)
    ms = flat_m.reshape(n_chunks, chunk)

    def body(args):
        c, m = args
        return _knn_chunk(c, m, xyz, grid, meta, cfg)

    if n_chunks == 1:
        pidx, d2 = body((cs[0], ms[0]))
        pidx, d2 = pidx[None], d2[None]
    else:
        pidx, d2 = jax.lax.map(body, (cs, ms))
    pidx = pidx.reshape(-1, cfg.K)[:total].reshape(R, SR, cfg.K)
    d2 = d2.reshape(-1, cfg.K)[:total].reshape(R, SR, cfg.K)
    return pidx, d2


# --------------------------------------------------------------------------
# Full query (ray gen -> shading selection -> KNN)
# --------------------------------------------------------------------------

def generate_shading_points(grid: PointGrid, campos: jnp.ndarray,
                            raydir: jnp.ndarray, near: float, far: float,
                            cfg: QueryConfig, jitter: float = 0.0,
                            key: Optional[jnp.ndarray] = None,
                            gen_name: Optional[str] = None,
                            gen_kwargs: Tuple = ()):
    """Ray generation + occupancy-selected shading locations (the pre-KNN half
    of query_points). Returns (sample_loc_w [R,SR,3], sample_mask [R,SR])."""
    meta = grid_meta(cfg)
    gen = RAY_GENERATORS[gen_name or (
        "near_far_disparity_linear" if cfg.inverse > 0 else "near_far_linear")]
    raypos, _seg, tvals = gen(campos, raydir, cfg.z_depth_dim, near, far,
                              jitter=jitter, key=key, **dict(gen_kwargs))
    tvals = jnp.broadcast_to(tvals, raypos.shape[:2])
    return select_shading_points(
        raypos, grid, meta, cfg.SR, tvals=tvals, campos=campos, raydir=raydir,
        select=cfg.slot_select)


@functools.partial(jax.jit, static_argnames=("cfg", "jitter", "gen_name",
                                              "gen_kwargs"))
def query_points(xyz: jnp.ndarray, grid: PointGrid, campos: jnp.ndarray,
                 raydir: jnp.ndarray, near: float, far: float,
                 cfg: QueryConfig, jitter: float = 0.0,
                 key: Optional[jnp.ndarray] = None,
                 gen_name: Optional[str] = None,
                 gen_kwargs: Tuple = ()) -> QueryResult:
    """End-to-end neighbor query, mirroring lighting_fast_querier.query_points
    (query_point_indices_worldcoords.py:84-99) with static shapes.

    gen_name: explicit ray-generator registry key (RenderConfig.
    which_ray_generation); defaults to cfg.inverse selection.
    gen_kwargs: extra generator params as a hashable (name, value) tuple
    (e.g. near_middle_far's middle/middle_split)."""
    sample_loc_w, sample_mask = generate_shading_points(
        grid, campos, raydir, near, far, cfg, jitter=jitter, key=key,
        gen_name=gen_name, gen_kwargs=gen_kwargs)
    sample_pidx, _d2 = knn_query(sample_loc_w, sample_mask, xyz, grid, cfg)
    pnt_mask = sample_pidx >= 0
    # Rays whose shading points found zero neighbors drop out of the mask
    # (reference :715-717).
    ray_mask = jnp.any(pnt_mask.reshape(raydir.shape[0], -1), axis=-1)
    sample_mask = sample_mask & jnp.any(pnt_mask, axis=-1)
    return QueryResult(sample_pidx=sample_pidx, sample_loc_w=sample_loc_w,
                       sample_mask=sample_mask, ray_mask=ray_mask)
