"""The jitted training step.

Replaces the reference's optimize_parameters path
(models/neural_points_volumetric_model_ori.py:220-223 -> forward -> backward)
with a single fused jit: render -> loss -> grad -> two-group Adam update.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import PointNeRFConfig
from ..models.losses import compute_losses, mse2psnr
from ..models.points import PointCloud, PointCloudStatic
from ..models.renderer import RayBatch, RenderOutput, render_rays
from ..ops.grid import PointGrid, build_grid
from .optim import (alternated_update, apply_grad_flags, freeze_points,
                    hit_boost, make_optimizer)


class TrainState(NamedTuple):
    params: Dict[str, Any]        # {"mlp": aggregator params, "points": PointCloud}
    opt_state: Any
    step: jnp.ndarray             # [] int32
    key: jnp.ndarray              # PRNG key
    # per-point counters [capacity, 3]: column 0 cumulative neighbor hits,
    # column 1 hit EMA (TrainConfig.hit_ema_decay), column 2 payload
    # gradient-norm EMA (feeds gradient-driven splitting, grow.py
    # split_high_grad). Gradient-starvation levers (hit_lr_boost,
    # prune_min_hits, split_iter) read these; prune/grow repack them like
    # Adam moments. No reference analog — the reference tracks nothing
    # per-point beyond conf.
    hits: Optional[jnp.ndarray] = None


def create_train_state(key, agg_params, pc: PointCloud,
                       cfg: PointNeRFConfig) -> TrainState:
    params = {"mlp": agg_params, "points": pc}
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.asarray(0, jnp.int32), key=key,
                      hits=jnp.zeros((pc.capacity, 3), jnp.float32))


def loss_fn(params, st: PointCloudStatic, grid: PointGrid, batch: RayBatch,
            cfg: PointNeRFConfig, key, compute_dtype=jnp.float32):
    pc = freeze_points(params["points"], cfg.points)
    out = render_rays(params["mlp"], pc, st, grid, batch, cfg,
                      key=key, train=True, compute_dtype=compute_dtype)
    total, items = compute_losses(out, batch.gt_image, cfg.loss)
    items["psnr_masked"] = mse2psnr(items.get(
        "loss_ray_masked_coarse_raycolor", jnp.asarray(0.0)))
    mse_all = jnp.mean((out.coarse_raycolor - batch.gt_image) ** 2)
    items["psnr"] = mse2psnr(mse_all)
    # miss count feeds the probe-frame ranking (reference top_ray_miss_ids,
    # mvs_points_volumetric_model.py:139-171): only misses whose GT is not
    # background count (probe miss criterion, train_ft.py:503)
    miss = ~out.ray_mask
    if batch.gt_image is not None and batch.gt_image.shape[-1] == 3:
        bg = jnp.asarray(cfg.render.bg_color, jnp.float32)
        miss = miss & (jnp.linalg.norm(batch.gt_image - bg[None], axis=-1)
                       > 2e-3)
    items["n_miss"] = jnp.sum(miss)
    if out.decode_dropped is not None:
        # compacted-decode overflow (valid slots past capacity): should be 0
        # in a healthy run — drivers log it so capacity can be raised
        items["n_decode_dropped"] = out.decode_dropped
    # per-ray squared error — feeds the loss-aware ray importance sampler
    # (train/sampler.py; the reference's ray_masked machinery
    # base_rendering_model.py:542-571 is the analogous per-ray hook)
    if batch.gt_image is not None:
        items["per_ray_err"] = jax.lax.stop_gradient(
            jnp.mean((out.coarse_raycolor - batch.gt_image) ** 2, axis=-1))
    # per-point neighbor-hit increment for the starvation levers — a
    # collision-heavy scatter, traced out entirely when no lever reads it
    # (config.hits_tracked)
    from ..config import hits_tracked
    if hits_tracked(cfg):
        cap = params["points"].capacity
        inc = jnp.zeros((cap,), jnp.float32)
        for pidx in (out.neighbor_pidx, out.fine_neighbor_pidx):
            if pidx is not None:
                flat = pidx.reshape(-1)
                inc = inc.at[jnp.where(flat >= 0, flat, cap)].add(
                    1.0, mode="drop")
        items["hit_inc"] = inc
    return total, items


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(state: TrainState, st: PointCloudStatic, grid: PointGrid,
               batch: RayBatch, cfg: PointNeRFConfig
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    key, sub = jax.random.split(state.key)
    (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, st, grid, batch, cfg, sub)
    grads["points"] = apply_grad_flags(grads["points"], cfg.points)

    tx = make_optimizer(cfg)
    updates, new_opt = alternated_update(tx, grads, state.opt_state,
                                         state.params, state.step,
                                         cfg.train.alter_step)
    hit_inc = items.pop("hit_inc", None)
    new_hits = state.hits
    if state.hits is not None and hit_inc is not None:
        d = cfg.train.hit_ema_decay
        # per-point payload gradient norm (post grad-flags, pre-boost): the
        # splitting score (grow.py split_high_grad) reads its EMA
        gpt = grads["points"]
        gnorm = jnp.sqrt(jnp.sum(gpt.features ** 2, -1)
                         + jnp.sum(gpt.color ** 2, -1)
                         + jnp.sum(gpt.conf ** 2, -1)
                         + jnp.sum(gpt.xyz ** 2, -1))
        new_hits = jnp.stack([state.hits[:, 0] + hit_inc,
                              state.hits[:, 1] * d + hit_inc * (1.0 - d),
                              state.hits[:, 2] * d + gnorm * (1.0 - d)],
                             axis=-1)
        if cfg.train.hit_lr_boost > 1.0:
            # under-hit payloads move faster (pre-update EMA; see optim.py)
            boost = hit_boost(state.hits[:, 1], cfg.train.hit_lr_boost,
                              cfg.train.hit_boost_pow)[:, None]
            p = updates["points"]
            updates["points"] = p._replace(
                features=p.features * boost, color=p.color * boost,
                dirs=p.dirs * boost, conf=p.conf * boost)
    new_params = optax.apply_updates(state.params, updates)
    items["loss_total"] = total
    return TrainState(params=new_params, opt_state=new_opt,
                      step=state.step + 1, key=key, hits=new_hits), items


@functools.partial(jax.jit, static_argnames=("cfg", "prob"))
def eval_step(params, st: PointCloudStatic, grid: PointGrid, batch: RayBatch,
              cfg: PointNeRFConfig, prob: bool = False) -> RenderOutput:
    """Inference forward (no jitter, no grad) — reference test()
    (run/train_ft.py:255-323) renders images in ray chunks with this."""
    return render_rays(params["mlp"], params["points"], st, grid, batch, cfg,
                       key=None, train=False, prob=prob)


def _row_major(a):
    """Relayout an array to row-major device layout if it is not already.

    Since the round-5 grid-build fix (ops/grid.py: the coordinate-major
    flattening is a lane concat, not a transpose) the tables come out
    row-major naturally and this is a no-op guard. When it does fire, the
    relayout is a jitted identity with an explicit output Format — NOT a
    `jax.device_put(a, Format(...))`: on the axon backend a fresh
    explicit-layout device_put fed to an already-cached executable fails
    the next execution with an async INVALID_ARGUMENT (the round-4/5
    crash class — bisect: runs/repro_e4 vs repro_e5; a committed pin also
    breaks mixed-placement jits on the dryrun parity path)."""
    import os
    if os.environ.get("POINTNERF_NO_ROWMAJOR", "") not in ("", "0"):
        return a
    try:
        from jax.experimental.layout import Format, Layout
        mtm = tuple(range(a.ndim))
        if a.format.layout.major_to_minor == mtm:
            # already row-major (always true on CPU) — return the array
            # untouched so uncommitted arrays stay uncommitted and jit
            # keeps its placement freedom (the dryrun parity path renders
            # a single-device reference next to mesh-replicated params)
            return a
        fmt = Format(Layout(major_to_minor=mtm), a.sharding)
        return jax.jit(lambda x: x, out_shardings=fmt)(a)
    except Exception:  # pragma: no cover — layout API unavailable
        return a


def refresh_grid(pc: PointCloud, st: PointCloudStatic,
                 cfg: PointNeRFConfig) -> PointGrid:
    """Rebuild the occupancy grid after a point-set change (prune/grow).
    The reference rebuilds this every iteration (query_grid_point_index
    :626); positions only change on prune/grow here, so callers cache it.

    Truncation guard (round-4 finding: a silently truncated neighbor table
    left one side of the scene with NO neighbors and capped quality-scale
    PSNR): if the TRUE dilated-occupied cell count exceeds the table
    envelope, the grid is REBUILT with max_d auto-sized to 1.25x the true
    count — never silently truncated. Downstream jits key on the table
    shapes, so a resize retraces once; the 25% headroom keeps subsequent
    grows inside the same envelope. The reference's analogous cap (max_o,
    query_point_indices_worldcoords.py:290-299) silently drops cells."""
    import dataclasses as _dc
    grid = build_grid(pc.xyz, st.num_active, cfg.query)
    nd = int(grid.num_dil)
    caps = [grid.occ_vids.shape[0]] if grid.occ_vids is not None else []
    if grid.nbr_pid is not None:
        caps.append(grid.nbr_pid.shape[0])
    if caps and nd > min(caps):
        new_max_d = -(-int(nd * 1.25) // 4096) * 4096
        print(f"[grid] {nd} dilated-occupied cells exceed the table "
              f"envelope {min(caps)}; rebuilding with max_d={new_max_d} "
              f"(auto-sized — silent truncation would leave "
              f"{nd - min(caps)} cells with no neighbor-table row)")
        q = _dc.replace(cfg.query, max_d=new_max_d)
        grid = build_grid(pc.xyz, st.num_active, q)
    if grid.nbr_xyz is not None:
        grid = grid._replace(nbr_xyz=_row_major(grid.nbr_xyz),
                             nbr_pid=_row_major(grid.nbr_pid))
    return grid
