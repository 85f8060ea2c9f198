"""Point pruning & hole-probing growth.

Reimplements the reference's per-scene point maintenance:
 - prune: drop low-confidence points every `prune_iter` steps
   (run/train_ft.py:841-849 -> NeuralPoints.prune, neural_points.py:350-373).
 - grow: every `prob_freq` steps, render probe frames with the prob outputs
   on, find rays that MISS the cloud but have non-background ground truth,
   dilate that miss mask by 1px, and add new points at the neighboring rays'
   max-opacity sample locations with weighted-average payloads
   (run/train_ft.py:420-533 `probe_hole` + `bloat_inds`:535-543).

The reference restarts the whole process after growing (exit() at
train_ft.py:918 + the bash loop lego.sh:163) because torch optimizers can't
survive a shape change. Here point arrays live in fixed-capacity buckets
(models/points.py), so growth is in-place and the Adam state is CARRIED
through every point-set change: prune permutes per-point moments with the
pack order (permute_point_opt_state), grow appends zero-moment slots
(pad_point_opt_state). No reset, no schedule fast-forward — the post-prune
quality collapse of the reference's rebuild disappears (PERF.md A/B).
"""
from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PointNeRFConfig
from ..models.points import (DEAD_XYZ, PointCloud, PointCloudStatic, grow,
                             prune, round_capacity)
from ..models.renderer import RayBatch
from .step import TrainState, eval_step, refresh_grid


class ProbeCandidates(NamedTuple):
    xyz: np.ndarray        # [M, 3]
    embedding: np.ndarray  # [M, F]
    color: np.ndarray      # [M, 3]
    dirs: np.ndarray       # [M, 3]
    conf: np.ndarray       # [M, 1]


def render_full_frame(params, st, grid, cfg: PointNeRFConfig, item: Dict,
                      wh: Tuple[int, int], chunk: int = 2304,
                      prob: bool = True) -> Dict[str, np.ndarray]:
    """Chunked full-image render assembling H x W maps of the probe outputs
    (reference chunk loop train_ft.py:286-323 / probe loop :476-497)."""
    W, H = wh
    raydir = np.asarray(item["raydir"], np.float32)
    pix = np.asarray(item["pixel_idx"], np.int64)
    total = raydir.shape[0]
    maps: Dict[str, np.ndarray] = {}
    keys = ["coarse_raycolor", "ray_mask", "ray_max_sample_loc_w",
            "ray_max_far_dist", "ray_max_shading_opacity",
            "shading_avg_color", "shading_avg_dir", "shading_avg_conf",
            "shading_avg_embedding"] if prob else ["coarse_raycolor",
                                                   "ray_mask"]
    if prob and cfg.render.nerf_importance > 0:
        keys += ["nerf_mass", "nerf_loc_w", "nerf_color"]
    from ..config import jit_canonical
    jcfg = jit_canonical(cfg)
    campos = jnp.asarray(item["campos"])
    camrot = jnp.asarray(item["camrotc2w"])
    near = jnp.asarray(cfg.render.near_plane, jnp.float32)
    far = jnp.asarray(cfg.render.far_plane, jnp.float32)
    zero_pix = jnp.zeros((chunk, 2), jnp.int32)
    # Dispatch every chunk asynchronously, keeping ONLY the map fields alive
    # (the full RenderOutput pins [R,SR,K] intermediates), then materialize
    # in one batched device_get: per-chunk host syncs round-trip the axon
    # tunnel for ~200ms each, which dominated eval wall time (PERF.md r3).
    pending: list = []
    fetched: list = []
    # Materialize in bounded batches: one device_get over EVERY chunk of a
    # full prob-mode frame keeps ~70 chunks x 12 arrays of device buffers
    # alive at once, which the axon tunnel rejects (the failure is async —
    # a TPU-backend INVALID_ARGUMENT surfacing at the NEXT host->device
    # transfer; PERF.md round-4 known issue). 16 chunks still amortizes
    # the ~200ms per-sync tunnel round-trip 16x.
    flush_every = 16

    def _flush():
        if len(fetched) < len(pending):
            lo = len(fetched)
            batch_vals = [vals for _, _, vals in pending[lo:]]
            fetched.extend(jax.device_get(batch_vals))
            # drop the device references NOW (advisor r4): without this the
            # bounded flush only bounds the transfer-call size — every
            # chunk's device buffers stay alive until the function returns
            for i in range(lo, len(pending)):
                pending[i] = (pending[i][0], pending[i][1], None)

    for s in range(0, total, chunk):
        e = min(s + chunk, total)
        rd = raydir[s:e]
        pad = chunk - rd.shape[0]
        if pad:
            rd = np.concatenate([rd, np.zeros((pad, 3), np.float32)])
        batch = RayBatch(
            campos=campos, camrotc2w=camrot, raydir=jnp.asarray(rd),
            pixel_idx=zero_pix, near=near, far=far, gt_image=None)
        out = eval_step(params, st, grid, batch, jcfg, prob=prob)
        pending.append((s, e, {k: getattr(out, k) for k in keys
                               if getattr(out, k) is not None}))
        if len(pending) - len(fetched) >= flush_every:
            _flush()
    _flush()
    for (s, e, _), vals in zip(pending, fetched):
        n = e - s
        px, py = pix[s:e, 0], pix[s:e, 1]
        for k, v in vals.items():
            v = v[:n]
            if v.ndim == 1:
                v = v[:, None]
            if k not in maps:
                maps[k] = np.zeros((H, W, v.shape[-1]), v.dtype)
            maps[k][py, px] = v
    return maps


def _dilate3(mask: np.ndarray) -> np.ndarray:
    """3x3 binary dilation (bloat_inds with shift=1, train_ft.py:535-543)."""
    out = mask.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out |= np.roll(np.roll(mask, dy, axis=0), dx, axis=1)
    return out


def accumulate_probe_candidates(adds: Dict, maps: Dict, item: Dict,
                                cfg: PointNeRFConfig, wh: Tuple[int, int],
                                bg: np.ndarray):
    """Shared per-frame hole/dilation/opacity candidate selection
    (train_ft.py:499-520), used by both the single-device and sharded
    probes."""
    W, H = wh
    gt = np.zeros((H, W, 3), np.float32)
    pix = np.asarray(item["pixel_idx"], np.int64)
    gt[pix[:, 1], pix[:, 0]] = np.asarray(item["gt_image"], np.float32)
    ray_mask = maps["ray_mask"][..., 0] > 0
    # rays the query missed but whose GT is not background
    miss = (~ray_mask) & (np.linalg.norm(gt - bg, axis=-1) > 0.002)
    # grow at HIT rays adjacent to misses whose peak opacity is confident
    sel = (ray_mask & _dilate3(miss)
           & (maps["ray_max_shading_opacity"][..., 0]
              > cfg.train.prob_thresh))
    if sel.any():
        adds["xyz"].append(maps["ray_max_sample_loc_w"][sel])
        adds["embedding"].append(maps["shading_avg_embedding"][sel])
        adds["color"].append(maps["shading_avg_color"][sel])
        adds["dirs"].append(maps["shading_avg_dir"][sel])
        adds["conf"].append(maps["shading_avg_conf"][sel]
                            * cfg.train.prob_mul)
    # NeRF-driven creation (reference --nerf_create_points): missed rays
    # where the radiance field carries confident blend mass get points at
    # the field's expected depth — unlike the hole path above, this covers
    # regions with NO nearby point geometry at all
    if (cfg.train.nerf_create_points and "nerf_mass" in maps
            and maps.get("nerf_color") is not None
            and maps["nerf_color"].shape[-1] == 3):
        seln = miss & (maps["nerf_mass"][..., 0] > cfg.train.prob_thresh)
        if seln.any():
            n = int(seln.sum())
            adds["xyz"].append(maps["nerf_loc_w"][seln])
            # fresh features: the field has no point embedding to donate —
            # small deterministic noise like feature_init_method="rand"
            rng = np.random.RandomState(n)
            F = cfg.agg.point_features_dim
            adds["embedding"].append(
                rng.randn(n, F).astype(np.float32) * 0.01)
            adds["color"].append(maps["nerf_color"][seln])
            # face the camera: candidate dir = -raydir at those pixels
            rd = np.zeros((H, W, 3), np.float32)
            rd[pix[:, 1], pix[:, 0]] = np.asarray(item["raydir"], np.float32)
            d = -rd[seln]
            d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
            adds["dirs"].append(d)
            adds["conf"].append(maps["nerf_mass"][seln]
                                * cfg.train.prob_mul)


def finalize_probe_candidates(adds: Dict, cfg: PointNeRFConfig
                              ) -> ProbeCandidates:
    def cat(k, d):
        return (np.concatenate(adds[k]).astype(np.float32) if adds[k]
                else np.zeros((0, d), np.float32))
    F = cfg.agg.point_features_dim
    return ProbeCandidates(xyz=cat("xyz", 3), embedding=cat("embedding", F),
                           color=cat("color", 3), dirs=cat("dirs", 3),
                           conf=cat("conf", 1))


def probe_hole(params, st, grid, cfg: PointNeRFConfig, items: List[Dict],
               wh: Tuple[int, int], bg_color=None,
               chunk: int = 2304) -> ProbeCandidates:
    """Scan probe frames for holes; returns grow candidates
    (train_ft.py:420-533 semantics)."""
    bg = np.asarray(bg_color if bg_color is not None else cfg.render.bg_color,
                    np.float32)
    adds = {k: [] for k in ("xyz", "embedding", "color", "dirs", "conf")}
    for item in items:
        maps = render_full_frame(params, st, grid, cfg, item, wh, chunk,
                                 prob=True)
        accumulate_probe_candidates(adds, maps, item, cfg, wh, bg)
    return finalize_probe_candidates(adds, cfg)


def permute_point_opt_state(opt_state, order, kept, capacity: int):
    """Carry Adam moments through a prune repack: permute per-point moment
    rows with the same pack order and zero the dead tail. Leaves are matched
    by their leading dim == capacity (capacity >= 4096 > any MLP width, so
    MLP moments never match). The reference loses all optimizer state on its
    prune-restart; this preserves it."""
    def visit(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            out = x[order]
            dead = jnp.arange(capacity) >= kept
            return jnp.where(dead.reshape((-1,) + (1,) * (x.ndim - 1)),
                             0.0, out)
        return x
    return jax.tree.map(visit, opt_state)


def apply_prune(state: TrainState, st: PointCloudStatic,
                cfg: PointNeRFConfig) -> Tuple[TrainState, PointCloudStatic, int]:
    """Drop conf <= prune_thresh points, repack, permute Adam moments along
    (no optimizer reset — the post-prune quality dip of the reference's
    rebuild disappears). With prune_min_hits > 0, points whose cumulative
    neighbor-hit count is still below the floor are exempt: their low conf
    means "under-trained", not "misplaced" (the reference's global threshold
    deletes thin geometry on scaled-down schedules — PERF.md)."""
    protect = None
    if cfg.train.prune_min_hits > 0 and state.hits is not None:
        protect = state.hits[:, 0] < cfg.train.prune_min_hits
    pc2, st2, kept, order = prune(state.params["points"], st,
                                  cfg.train.prune_thresh, return_order=True,
                                  protect=protect)
    params = dict(state.params, points=pc2)
    opt_state = permute_point_opt_state(state.opt_state, order, kept,
                                        pc2.capacity)
    hits = state.hits
    if hits is not None:
        hits = jnp.where((jnp.arange(pc2.capacity) < kept)[:, None],
                         hits[order], 0.0)
    return (TrainState(params=params, opt_state=opt_state, step=state.step,
                       key=state.key, hits=hits), st2, int(kept))


def split_high_grad(state: TrainState, st: PointCloudStatic,
                    cfg: PointNeRFConfig
                    ) -> Tuple[TrainState, PointCloudStatic, int]:
    """Gradient-driven densification (no reference analog; 3DGS-style).

    Points whose payload-gradient EMA stays large RELATIVE to how often
    they are sampled (score = grad_ema / (hit_ema + 1)) mark
    under-reconstructed regions — typically thin geometry covered by too
    few points (PERF.md cluster/thicket failure analysis). The top
    `split_top` scorers are cloned: offspring inherit the parent payload
    and land a tangential `split_jitter * vsize` step away (perpendicular
    to the parent dir, i.e. in the local surface plane), then train as
    ordinary points (zero Adam moments, zero hit counters — so
    prune_min_hits shields them while young). Parents' grad EMA resets so
    one hot region doesn't re-split every event.
    """
    t = cfg.train
    if state.hits is None or state.hits.shape[1] < 3 or t.split_top <= 0:
        return state, st, 0
    pc: PointCloud = state.params["points"]
    n_act = int(st.num_active)
    hits = np.asarray(state.hits)
    score = hits[:n_act, 2] / (hits[:n_act, 1] + 1.0)
    n = min(t.split_top, n_act)
    parents = np.argsort(-score)[:n]
    parents = parents[score[parents] > 0.0]
    if parents.size == 0:
        return state, st, 0

    # deterministic tangential jitter from the parent ids + step
    rng = np.random.RandomState(int(state.step) & 0x7FFFFFFF)
    pxyz = np.asarray(pc.xyz[parents])
    pdir = np.asarray(pc.dirs[parents])
    nrm = pdir / np.maximum(np.linalg.norm(pdir, axis=-1, keepdims=True),
                            1e-8)
    r = rng.randn(parents.size, 3).astype(np.float32)
    tang = r - np.sum(r * nrm, axis=-1, keepdims=True) * nrm
    tl = np.linalg.norm(tang, axis=-1, keepdims=True)
    # degenerate (r parallel to nrm / zero dir): fall back to r itself
    tang = np.where(tl > 1e-6, tang / np.maximum(tl, 1e-8),
                    r / np.maximum(np.linalg.norm(r, axis=-1,
                                                  keepdims=True), 1e-8))
    step_len = t.split_jitter * float(max(cfg.query.vsize[0],
                                          cfg.query.vsize[1]))
    cand = ProbeCandidates(
        xyz=(pxyz + tang * step_len).astype(np.float32),
        embedding=np.asarray(pc.features[parents]),
        color=np.asarray(pc.color[parents]),
        dirs=pdir,
        conf=np.asarray(pc.conf[parents]))
    state, st, added = apply_grow(state, st, cand, cfg)
    if added and state.hits is not None:
        state = state._replace(
            hits=state.hits.at[jnp.asarray(parents), 2].set(0.0))
    return state, st, added


def pad_point_opt_state(opt_state, old_cap: int, new_cap: int):
    """Zero-pad per-point Adam moments to a grown capacity bucket (new
    slots had zero gradients, so zero moments are exact)."""
    def visit(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == old_cap:
            pad = jnp.zeros((new_cap - old_cap,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x, pad])
        return x
    return jax.tree.map(visit, opt_state)


def apply_grow(state: TrainState, st: PointCloudStatic,
               cand: ProbeCandidates, cfg: PointNeRFConfig
               ) -> Tuple[TrainState, PointCloudStatic, int]:
    """Append probe candidates, re-bucketing capacity if needed. Adam state
    is carried: grown slots start with zero moments (dead slots never
    received gradients), so no optimizer reset is required — unlike the
    reference's grow-restart which drops all optimizer state."""
    pc: PointCloud = state.params["points"]
    opt_state = state.opt_state
    hits = state.hits
    n_new = cand.xyz.shape[0]
    needed = int(st.num_active) + n_new
    if needed > pc.capacity:
        old_cap = pc.capacity
        new_cap = round_capacity(needed)

        def repad(a, fill):
            out = jnp.full((new_cap,) + a.shape[1:], fill, a.dtype)
            return out.at[: a.shape[0]].set(a)
        pc = PointCloud(xyz=repad(pc.xyz, DEAD_XYZ),
                        features=repad(pc.features, 0.0),
                        conf=repad(pc.conf, 0.0), color=repad(pc.color, 0.0),
                        dirs=repad(pc.dirs, 0.0))
        opt_state = pad_point_opt_state(opt_state, old_cap, new_cap)
        if hits is not None:
            hits = repad(hits, 0.0)  # grown slots start with zero hits
    if n_new:
        pc, st, added = grow(pc, st, jnp.asarray(cand.xyz),
                             jnp.asarray(cand.embedding),
                             jnp.asarray(cand.conf), jnp.asarray(cand.color),
                             jnp.asarray(cand.dirs))
        added = int(added)
    else:
        added = 0
    params = dict(state.params, points=pc)
    return (TrainState(params=params, opt_state=opt_state, step=state.step,
                       key=state.key, hits=hits), st, added)
