"""Per-scene optimization driver — the `run/train_ft.py` equivalent.

One process, no restart loop: the reference wraps training in a bash loop
and exits after every grow event (lego.sh:163, train_ft.py:918); here
prune/grow are in-place (train/grow.py) and the jit caches survive because
point arrays live in fixed-capacity buckets.

Loop schedule mirrors train_ft.py:836-1005:
  - every `prune_iter` steps in (0, prune_max_iter]: confidence prune
  - every `prob_freq` steps: probe-hole growing over probe frames
  - every `test_freq`: full-frame eval with PSNR/SSIM
  - every `save_iter_freq`: checkpoint
Run `python -m pointnerf_tpu.train.driver --demo` for a CPU-sized synthetic
end-to-end run.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PointNeRFConfig, bench_config, tiny_test_config
from ..data.synthetic import ring_cameras, sphere_scene, view_ray_batch
from ..models.aggregator import init_aggregator_params
from ..models.points import make_point_cloud
from ..models.renderer import RayBatch
from ..utils.metrics import (psnr as psnr_np, rmse as rmse_np,
                             ssim as ssim_np)
from ..utils.visualizer import Visualizer
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .grow import (apply_grow, apply_prune, probe_hole, render_full_frame,
                   split_high_grad)
from .step import (TrainState, create_train_state, eval_step, refresh_grid,
                   train_step)


class ItemPrefetcher:
    """Background-thread item generation: overlaps the host-side ray
    sampling / GT assembly with device compute (the real on-chip run was
    host-bound at ~55% device utilization without it). The reference gets
    the same overlap from torch DataLoader workers (data/__init__.py:56-87).
    """

    def __init__(self, item_fn, start_step: int, depth: int = 4):
        import queue
        import threading
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        self._err = None

        def worker():
            import queue as _queue
            step = start_step
            while not self._stop.is_set():
                step += 1
                try:
                    payload = (step, item_fn(step))
                except BaseException as e:  # surface in get(), don't die mute
                    self._err = e
                    return
                while not self._stop.is_set():
                    try:
                        self._q.put(payload, timeout=1.0)
                        break
                    except _queue.Full:
                        continue
        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def get(self):
        import queue as _queue
        while True:
            if self._err is not None:
                raise RuntimeError("item prefetch worker failed") from self._err
            try:
                return self._q.get(timeout=5.0)
            except _queue.Empty:
                continue

    def close(self):
        self._stop.set()


def init_mlp_params(key, cfg: PointNeRFConfig):
    """Aggregator params + the proposal-NeRF field branch when enabled —
    every entry point that builds or restores a param tree must use this so
    hybrid checkpoints round-trip (params["nerf"] is part of the template)."""
    params = init_aggregator_params(key, cfg.agg)
    if cfg.render.nerf_importance > 0:
        from ..models.nerf_branch import init_nerf_params
        params["nerf"] = init_nerf_params(jax.random.fold_in(key, 7), cfg)
    return params


def _sync_maint(tag: str, *trees):
    """Debug aid (POINTNERF_SYNC_MAINT=1): force every pending dispatch to
    complete so an async TPU-backend poison surfaces AT the guilty stage
    instead of at some later unrelated transfer (the round-4/5
    INVALID_ARGUMENT hunts)."""
    if os.environ.get("POINTNERF_SYNC_MAINT", "") in ("", "0"):
        return
    jax.block_until_ready(trees)
    print(f"[sync] {tag} ok", flush=True)


def _to_batch(item: Dict, cfg: PointNeRFConfig) -> RayBatch:
    return RayBatch(
        campos=jnp.asarray(item["campos"]),
        camrotc2w=jnp.asarray(item["camrotc2w"]),
        raydir=jnp.asarray(item["raydir"]),
        pixel_idx=jnp.asarray(item["pixel_idx"], jnp.int32),
        near=jnp.asarray(cfg.render.near_plane, jnp.float32),
        far=jnp.asarray(cfg.render.far_plane, jnp.float32),
        gt_image=jnp.asarray(item["gt_image"]))


def evaluate(params, st, grid, cfg, items: List[Dict], wh, vis: Visualizer,
             step: int, save_images: bool = False,
             lpips: bool = False) -> Dict[str, float]:
    """Full-frame test pass (reference test(), run/train_ft.py:255-409).
    lpips=True adds the framework-relative LPIPS proxy (utils/metrics.py) —
    ~9s host time per 800x800 view, so drivers enable it on the final eval
    only (the reference computes LPIPS over the test split once,
    run/evaluate.py:34-97)."""
    W, H = wh
    psnrs, ssims, rmses, lprox = [], [], [], []
    for i, item in enumerate(items):
        chunk = int(os.environ.get("POINTNERF_EVAL_CHUNK", "9216"))
        maps = render_full_frame(params, st, grid, cfg, item, wh,
                                 chunk=chunk if W * H >= chunk else 2304,
                                 prob=False)
        img = maps["coarse_raycolor"][..., :3]
        gt = np.zeros((H, W, 3), np.float32)
        pix = np.asarray(item["pixel_idx"], np.int64)
        gt[pix[:, 1], pix[:, 0]] = np.asarray(item["gt_image"], np.float32)
        psnrs.append(psnr_np(img, gt))
        ssims.append(ssim_np(img, gt))
        rmses.append(rmse_np(img, gt))
        if lpips:
            from ..utils.metrics import lpips_proxy
            lprox.append(lpips_proxy(img, gt))
        if save_images:
            vis.save_image(img, f"step{step:08d}-{i:02d}.png")
    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
           "rmse": float(np.mean(rmses))}
    if lprox:
        out["lpips_proxy"] = float(np.mean(lprox))
    return out


def train_scene(cfg: PointNeRFConfig,
                scene_pts: Tuple[np.ndarray, np.ndarray, np.ndarray],
                train_items_fn, test_items: List[Dict],
                probe_items: List[Dict], wh: Tuple[int, int],
                run_dir: str = "runs/scene", max_steps: Optional[int] = None,
                resume: bool = False, log_every: Optional[int] = None,
                target_psnr: Optional[float] = None,
                features: Optional[np.ndarray] = None,
                conf: Optional[np.ndarray] = None,
                sampler=None):
    """Optimize one scene. `train_items_fn(step)` yields a ray-batch item.
    `features`/`conf` carry MVS-extracted payloads when available
    (gen_points_filter_embeddings path); otherwise features init per
    cfg.points.feature_init_method.

    `sampler` (train/sampler.ErrorMapSampler, optional): when given, each
    step's per-ray errors are fed back to it (batched transfers at the log
    cadence) so `train_items_fn` can importance-sample pixels from it.

    Returns (state, st, history dict)."""
    xyz, color, normals = scene_pts
    vis = Visualizer(run_dir, name=os.path.basename(run_dir))
    vis.save_options(cfg.to_json())

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.train.seed), 3)
    if features is not None and features.shape[1] != cfg.agg.point_features_dim:
        features = None  # dim mismatch with the aggregator: fall back to init
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              features=features, conf=conf,
                              color=color, dirs=normals)
    params = init_mlp_params(k2, cfg)
    state = create_train_state(k3, params, pc, cfg)

    if resume:
        path = latest_checkpoint(run_dir)
        if path:
            from .checkpoint import checkpoint_meta
            meta = checkpoint_meta(path)
            cap = meta.get("capacity")
            if cap is not None and cap != pc.capacity:
                # growth re-bucketed the cloud: rebuild the restore template
                # at the checkpointed capacity
                pc, st = make_point_cloud(
                    xyz, k1, cfg.points, cfg.agg.point_features_dim,
                    features=features, conf=conf, color=color, dirs=normals,
                    capacity=cap)
                state = create_train_state(k3, params, pc, cfg)
            state, meta = load_checkpoint(path, state)
            n_active = meta.get("num_active")
            if n_active is not None:
                st = st._replace(num_active=jnp.asarray(n_active, jnp.int32))
            print(f"resumed from {path} at step {int(state.step)}")

    grid = refresh_grid(state.params["points"], st, cfg)
    max_steps = max_steps or cfg.train.maximum_step
    log_every = log_every or cfg.train.print_freq
    t = cfg.train
    # schedule-only fields are zeroed in the config used as the jit key so
    # runs differing only in cadence share one compiled step
    from ..config import jit_canonical
    jcfg = jit_canonical(cfg)
    history = {"loss": [], "eval": []}
    t0 = time.time()

    step_i = int(state.step)
    prefetch = ItemPrefetcher(train_items_fn, start_step=step_i)
    # per-frame ray-miss tallies for probe-frame ranking (reference
    # top_ray_miss_ids, mvs_points_volumetric_model.py:139-171). Device
    # scalars accumulate async; synced only when a probe fires.
    miss_tally: Dict = {}
    while step_i < max_steps:
        step_i += 1
        # ---- prune (train_ft.py:841-849) -------------------------------
        if (t.prune_iter > 0 and step_i % t.prune_iter == 0
                and step_i <= t.prune_max_iter):
            state, st, kept = apply_prune(state, st, cfg)
            grid = refresh_grid(state.params["points"], st, cfg)
            print(f"[prune] step {step_i}: kept {kept} points")
        # ---- grow (train_ft.py:851-918) --------------------------------
        if t.prob_freq > 0 and step_i % t.prob_freq == 0 and probe_items:
            # probe only the frames whose training batches missed the most
            # rays (reference max_num = len(dataset)//prob_num_step,
            # train_ft.py:443-452)
            if miss_tally:
                score = {k: float(np.sum(vs)) for k, vs in jax.device_get(
                    {k: list(vs) for k, vs in miss_tally.items()}).items()}
                ranked = sorted(
                    probe_items,
                    key=lambda it: -score.get(it.get("id"), 0.0))
                n_probe = max(1, len(ranked) // max(t.prob_num_step, 1))
                ranked = ranked[:n_probe]
                miss_tally.clear()
            else:
                ranked = probe_items
            _sync_maint("pre-probe", state, grid)
            cand = probe_hole(state.params, st, grid, cfg, ranked, wh)
            _sync_maint("post-probe", state, grid)
            state, st, added = apply_grow(state, st, cand, cfg)
            _sync_maint("post-grow", state, st)
            if added:
                # +0 probes leave the point set untouched — the grid is
                # identical, so rebuilding ~1 GB of tables is pure waste
                # (and the rebuild is where the flaky-tunnel INVALID_ARGUMENT
                # incidents concentrate; PERF.md round-5 log)
                grid = refresh_grid(state.params["points"], st, cfg)
                _sync_maint("post-refresh", grid)
            print(f"[grow] step {step_i}: +{added} points "
                  f"(total {int(st.num_active)})")
        # ---- gradient-driven splitting (densification; grow.py) ---------
        if (t.split_iter > 0 and step_i % t.split_iter == 0
                and step_i <= t.prune_max_iter):
            state, st, added = split_high_grad(state, st, cfg)
            if added:
                grid = refresh_grid(state.params["points"], st, cfg)
            print(f"[split] step {step_i}: +{added} points "
                  f"(total {int(st.num_active)})")

        fetched_step, item = prefetch.get()
        assert fetched_step == step_i, (fetched_step, step_i)
        batch = _to_batch(item, cfg)
        state, items = train_step(state, st, grid, batch, jcfg)
        _sync_maint(f"post-step-{step_i}", items)
        if (t.prob_freq > 0 and probe_items
                and item.get("id") is not None):
            miss_tally.setdefault(item["id"], []).append(items["n_miss"])
        per_ray_err = items.pop("per_ray_err", None)
        if sampler is not None and per_ray_err is not None:
            sampler.record(item.get("id"), item["pixel_idx"], per_ray_err)
        vis.accumulate_losses(
            {k: v for k, v in items.items() if k != "n_miss"})

        if step_i % log_every == 0:
            if sampler is not None:
                sampler.flush()
            if miss_tally:
                # fold pending per-step miss scalars to ONE host float per
                # view: between probes (prob_freq can be 500+ steps) the
                # tally otherwise holds one live device buffer per step,
                # and live-buffer pressure is the leading suspect for the
                # round-4 axon-tunnel INVALID_ARGUMENT poisons
                folded = jax.device_get({k: list(vs)
                                         for k, vs in miss_tally.items()})
                miss_tally = {k: [np.float32(np.sum(vs))]
                              for k, vs in folded.items()}
            means = vis.print_losses(step_i)
            history["loss"].append((step_i, means.get("loss_total", 0.0)))
        if t.test_freq > 0 and step_i % t.test_freq == 0 and test_items:
            m = evaluate(state.params, st, grid, cfg, test_items, wh, vis,
                         step_i, save_images=True,
                         lpips=step_i + t.test_freq > max_steps)
            m["step"] = step_i
            m["wall_s"] = time.time() - t0
            from ..config import hits_tracked
            if state.hits is not None and hits_tracked(cfg):
                # cumulative neighbor-hit distribution over active points —
                # calibrates TrainConfig.prune_min_hits (under-hit floor)
                h = np.asarray(state.hits[:max(1, int(st.num_active)), 0])
                m["hits_pct"] = {str(q): round(float(np.percentile(h, q)), 1)
                                 for q in (1, 5, 25, 50, 90)}
            history["eval"].append(m)
            print(f"[eval] step {step_i}: psnr={m['psnr']:.2f} "
                  f"ssim={m['ssim']:.4f} t={m['wall_s']:.0f}s")
            if target_psnr is not None and m["psnr"] >= target_psnr:
                print(f"[done] reached target PSNR {target_psnr}")
                break
        if t.save_iter_freq > 0 and step_i % t.save_iter_freq == 0:
            save_checkpoint(run_dir, state,
                            {"num_active": int(st.num_active),
                             "capacity": state.params["points"].capacity})
    prefetch.close()
    save_checkpoint(run_dir, state,
                    {"num_active": int(st.num_active),
                     "capacity": state.params["points"].capacity})
    return state, st, history


def render_video(params, st, grid, cfg: PointNeRFConfig, items: List[Dict],
                 wh: Tuple[int, int], run_dir: str, name: str = "spiral",
                 fps: int = 24) -> str:
    """Render a pose sequence to an mp4 (run/render_vid.py:26-133 — the
    reference iterates get_dummyrot_item frames through the chunked test
    renderer and stitches a video)."""
    vis = Visualizer(run_dir, name=name)
    frames = []
    for item in items:
        maps = render_full_frame(params, st, grid, cfg, item, wh,
                                 chunk=9216 if wh[0] * wh[1] >= 9216 else 2304,
                                 prob=False)
        frames.append(np.clip(maps["coarse_raycolor"][..., :3], 0, 1))
    return vis.gen_video(frames, name=name, fps=fps)


def eval_rays_sharded(eval_fn, params, scene, item: Dict,
                      cfg: PointNeRFConfig, n_devices: int,
                      chunk: int = 9216) -> np.ndarray:
    """Chunked sharded inference over an arbitrary ray count: chunks are
    padded to a dp*mp multiple (the mesh requires divisible ray batches) and
    bounded so full frames don't materialize [R, SR, mp*K, F] merged tensors
    at once (the single-device analog chunks at 2304, train/grow.py)."""
    raydir = np.asarray(item["raydir"], np.float32)
    R = raydir.shape[0]
    chunk = max(n_devices, (chunk // n_devices) * n_devices)
    outs = []
    for s in range(0, R, chunk):
        e = min(s + chunk, R)
        rd = raydir[s:e]
        if e - s < chunk:
            rd = np.concatenate(
                [rd, np.zeros((chunk - (e - s), 3), np.float32)])
        batch = RayBatch(
            campos=jnp.asarray(item["campos"]),
            camrotc2w=jnp.asarray(item["camrotc2w"]),
            raydir=jnp.asarray(rd),
            pixel_idx=jnp.zeros((chunk, 2), jnp.int32),
            near=jnp.asarray(cfg.render.near_plane, jnp.float32),
            far=jnp.asarray(cfg.render.far_plane, jnp.float32),
            gt_image=None)
        out = eval_fn(params, scene, batch)
        # keep the device array — one batched transfer below (per-chunk
        # np.asarray blocks on a tunnel round-trip per chunk, train/grow.py)
        outs.append((e - s, out.coarse_raycolor))
    fetched = jax.device_get([o for _, o in outs])
    return np.concatenate([v[:n] for (n, _), v in zip(outs, fetched)])


def probe_hole_sharded(eval_prob_fn, params, scene, cfg: PointNeRFConfig,
                       items: List[Dict], wh: Tuple[int, int],
                       n_devices: int, chunk: int = 9216):
    """Sharded probe-hole scan: full-frame prob-mode renders assembled
    across the mesh, then the same hole/dilation/opacity candidate logic as
    the single-device probe (train/grow.py probe_hole)."""
    from .grow import (accumulate_probe_candidates,
                       finalize_probe_candidates)
    W, H = wh
    bg = np.asarray(cfg.render.bg_color, np.float32)
    adds = {k: [] for k in ("xyz", "embedding", "color", "dirs", "conf")}
    keys = ["coarse_raycolor", "ray_mask", "ray_max_sample_loc_w",
            "ray_max_shading_opacity", "shading_avg_color",
            "shading_avg_dir", "shading_avg_conf", "shading_avg_embedding"]
    if cfg.render.nerf_importance > 0:
        keys += ["nerf_mass", "nerf_loc_w", "nerf_color"]
    chunk = max(n_devices, (chunk // n_devices) * n_devices)
    for item in items:
        raydir = np.asarray(item["raydir"], np.float32)
        pix = np.asarray(item["pixel_idx"], np.int64)
        R = raydir.shape[0]
        maps = {}
        pending = []
        for s in range(0, R, chunk):
            e = min(s + chunk, R)
            rd = raydir[s:e]
            if e - s < chunk:
                rd = np.concatenate(
                    [rd, np.zeros((chunk - (e - s), 3), np.float32)])
            batch = RayBatch(
                campos=jnp.asarray(item["campos"]),
                camrotc2w=jnp.asarray(item["camrotc2w"]),
                raydir=jnp.asarray(rd),
                pixel_idx=jnp.zeros((chunk, 2), jnp.int32),
                near=jnp.asarray(cfg.render.near_plane, jnp.float32),
                far=jnp.asarray(cfg.render.far_plane, jnp.float32),
                gt_image=None)
            out = eval_prob_fn(params, scene, batch)
            pending.append((s, e, {k: getattr(out, k) for k in keys}))
        # one batched device->host transfer per frame (see train/grow.py)
        fetched = jax.device_get([vals for _, _, vals in pending])
        for (s, e, _), vals in zip(pending, fetched):
            px, py = pix[s:e, 0], pix[s:e, 1]
            for k, v in vals.items():
                v = v[: e - s]
                if v.ndim == 1:
                    v = v[:, None]
                if k not in maps:
                    maps[k] = np.zeros((H, W, v.shape[-1]), v.dtype)
                maps[k][py, px] = v
        accumulate_probe_candidates(adds, maps, item, cfg, wh, bg)
    return finalize_probe_candidates(adds, cfg)


def train_scene_sharded(cfg: PointNeRFConfig, mesh,
                        scene_pts: Tuple[np.ndarray, np.ndarray, np.ndarray],
                        train_items_fn, test_items: List[Dict],
                        wh: Tuple[int, int], run_dir: str = "runs/sharded",
                        max_steps: Optional[int] = None,
                        log_every: Optional[int] = None,
                        probe_items: Optional[List[Dict]] = None):
    """Per-scene optimization over a (dp, mp) device mesh: rays
    data-parallel, point cloud + grids + Adam state sharded; prune runs
    per shard; eval reassembles full rays across the mesh. The multi-chip
    analog of train_scene (the reference's DDP loop, train_ddp.py:804-937).
    """
    from ..config import jit_canonical
    from ..parallel import (build_sharded_scene, create_sharded_train_state,
                            make_sharded_eval_step, make_sharded_train_step,
                            partition_points)
    from ..parallel.sharded import sharded_grow, sharded_prune

    xyz, color, normals = scene_pts
    mp = mesh.shape["mp"]
    vis = Visualizer(run_dir, name=os.path.basename(run_dir))
    vis.save_options(cfg.to_json())
    jcfg = jit_canonical(cfg)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.train.seed), 3)
    pc_s, num_active = partition_points(xyz, k1, cfg, mp=mp, color=color,
                                        dirs=normals)
    params = init_mlp_params(k2, cfg)
    scene = build_sharded_scene(pc_s, num_active, jcfg, mesh)
    state, scene = create_sharded_train_state(k3, params, pc_s, scene, jcfg,
                                              mesh)
    step_fn = make_sharded_train_step(jcfg, mesh)
    eval_fn = make_sharded_eval_step(jcfg, mesh)
    eval_prob_fn = (make_sharded_eval_step(jcfg, mesh, prob=True)
                    if probe_items else None)

    t = cfg.train
    max_steps = max_steps or t.maximum_step
    log_every = log_every or t.print_freq
    history = {"loss": [], "eval": []}
    step_i = int(state.step)
    prefetch = ItemPrefetcher(train_items_fn, start_step=step_i)
    while step_i < max_steps:
        step_i += 1
        if (t.prune_iter > 0 and step_i % t.prune_iter == 0
                and step_i <= t.prune_max_iter):
            # ORIGINAL cfg: jit_canonical zeroes prune_thresh (schedule
            # fields); sharded_prune's grid rebuild re-canonicalizes itself
            state, scene, kept = sharded_prune(state, scene, cfg, mesh)
            print(f"[prune] step {step_i}: kept {kept} points")
        if t.prob_freq > 0 and step_i % t.prob_freq == 0 and probe_items:
            cand = probe_hole_sharded(eval_prob_fn, state.params, scene,
                                      cfg, probe_items, wh,
                                      mesh.devices.size)
            state, scene, added = sharded_grow(state, scene, cand, cfg, mesh)
            print(f"[grow] step {step_i}: +{added} points "
                  f"(total {int(jnp.sum(scene.num_active))})")
        fetched_step, item = prefetch.get()
        assert fetched_step == step_i
        state, items = step_fn(state, scene, _to_batch(item, cfg))
        vis.accumulate_losses(items)
        if step_i % log_every == 0:
            means = vis.print_losses(step_i)
            history["loss"].append((step_i, means.get("loss_total", 0.0)))
        if t.test_freq > 0 and step_i % t.test_freq == 0 and test_items:
            psnrs = []
            n_dev = mesh.devices.size
            for item_t in test_items:
                img = eval_rays_sharded(eval_fn, state.params, scene, item_t,
                                        cfg, n_dev)
                psnrs.append(psnr_np(img, np.asarray(item_t["gt_image"])))
            m = {"step": step_i, "psnr": float(np.mean(psnrs))}
            history["eval"].append(m)
            print(f"[eval] step {step_i}: psnr={m['psnr']:.2f}")
    prefetch.close()
    save_checkpoint(run_dir, state,
                    {"num_active": [int(n) for n in scene.num_active]})
    return state, scene, history


def demo(steps: int = 300, n_pts: int = 2048, wh=(64, 64),
         run_dir: str = "runs/demo"):
    """CPU-sized end-to-end: synthetic sphere, analytic GT, a few hundred
    steps, prune+grow exercised once each."""
    cfg = tiny_test_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, maximum_step=steps, prune_iter=max(steps // 2, 1),
        prune_max_iter=steps, prob_freq=max(steps // 2 + 1, 1),
        test_freq=max(steps // 2, 1), print_freq=50, save_iter_freq=steps,
        random_sample_size=16))
    xyz, color, normals = sphere_scene(n_pts=n_pts)
    views = ring_cameras(n_views=6, wh=wh, focal=float(wh[0]))
    rng = np.random.RandomState(0)

    def train_item(step):
        campos, rot, K = views[rng.randint(0, len(views) - 1)]
        return view_ray_batch(campos, rot, K, wh,
                              n_rays=cfg.train.random_sample_size ** 2,
                              seed=step)

    test_items = [view_ray_batch(*views[-1], wh)]
    probe_items = [view_ray_batch(*views[0], wh)]
    state, st, hist = train_scene(
        cfg, (xyz, color, normals), train_item, test_items, probe_items, wh,
        run_dir=run_dir, max_steps=steps)
    print("final eval:", hist["eval"][-1] if hist["eval"] else "(none)")
    # spiral video over the camera ring (render_vid.py equivalent)
    grid = refresh_grid(state.params["points"], st, cfg)
    vid_items = [view_ray_batch(*v, wh) for v in views[:4]]
    path = render_video(state.params, st, grid, cfg, vid_items, wh,
                        run_dir=run_dir)
    print("video:", path)
    return hist


def ff_demo(steps: int = 20, wh=(32, 32)):
    """Feed-forward (generalization) demo: MVS -> points -> render, grads
    into the MVS nets (run/train.py mode-0 equivalent on synthetic data)."""
    import jax.numpy as jnp  # noqa: F811
    from ..mvs.points_init import MvsPointsInit, init_mvs_points, view_proj_mats
    from ..models.renderer import RayBatch as RB
    from .feedforward import MVSBatch, create_ff_state, make_feedforward_step
    from ..config import (AggregatorConfig, QueryConfig, RenderConfig,
                          TrainConfig)

    cfg = PointNeRFConfig(
        query=QueryConfig(vsize=(0.1, 0.1, 0.1), vscale=(2.0, 2.0, 2.0),
                          max_o=2048, P=8, K=4, SR=12, z_depth_dim=48,
                          ranges=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0),
                          knn_chunk=4096),
        agg=AggregatorConfig(point_features_dim=8, shading_feature_num=32,
                             num_feat_freqs=2, dist_xyz_freq=3,
                             num_pos_freqs=4, num_viewdir_freqs=2),
        render=RenderConfig(near_plane=2.0, far_plane=4.5))
    V = 3
    views = ring_cameras(n_views=V + 1, wh=wh, focal=float(wh[0]))
    images, Ks, w2cs = [], [], []
    for campos, rot, K in views[:V]:
        item = view_ray_batch(campos, rot, K, wh)
        images.append(item["gt_image"].reshape(wh[1], wh[0], 3))
        Ks.append(K)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = rot.T
        w2c[:3, 3] = -rot.T @ campos
        w2cs.append(w2c)
    images, Ks, w2cs = np.stack(images), np.stack(Ks), np.stack(w2cs)

    model = MvsPointsInit(point_features_dim=cfg.agg.point_features_dim)
    variables = init_mvs_points(model, jax.random.PRNGKey(0), V=V,
                                H=wh[1], W=wh[0])
    from ..models.aggregator import init_aggregator_params
    agg_params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    state = create_ff_state(jax.random.PRNGKey(2), variables, agg_params, cfg)
    step, _infer = make_feedforward_step(cfg, model,
                                         capacity=(wh[0] // 4) ** 2 * 2)
    for i in range(steps):
        target = view_ray_batch(*views[V], wh, n_rays=64, seed=i)
        rays = RB(campos=jnp.asarray(target["campos"]),
                  camrotc2w=jnp.asarray(target["camrotc2w"]),
                  raydir=jnp.asarray(target["raydir"]),
                  pixel_idx=jnp.asarray(target["pixel_idx"], jnp.int32),
                  near=jnp.asarray(cfg.render.near_plane),
                  far=jnp.asarray(cfg.render.far_plane),
                  gt_image=jnp.asarray(target["gt_image"]))
        batch = MVSBatch(images=jnp.asarray(images),
                         proj_mats=jnp.asarray(view_proj_mats(Ks, w2cs, 0)),
                         Ks=jnp.asarray(Ks), w2cs=jnp.asarray(w2cs),
                         depth_values=jnp.linspace(2.0, 4.5, 16), rays=rays)
        state, items = step(state, batch)
        if i % 5 == 0 or i == steps - 1:
            print(f"[ff] step {i}: loss={float(items['loss_total']):.5f} "
                  f"psnr={float(items['psnr']):.2f}")
    return state


def n2d_demo(steps: int = 40, patch: int = 16):
    """Feature-render + CNN-head demo (fork waymo mode): 16-channel feature
    rays decoded to RGB by the 2D neural renderer."""
    from ..models.neural_render import NeuralRenderer
    from .neural2d import create_neural2d_state, make_neural2d_step

    C = 16
    cfg = tiny_test_config()
    cfg = cfg.replace(agg=dataclasses.replace(
        cfg.agg, shading_color_channel_num=C))
    xyz, color, normals = sphere_scene(n_pts=2048)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              color=color, dirs=normals)
    params = init_aggregator_params(k2, cfg.agg)
    grid = refresh_grid(pc, st, cfg)
    head = NeuralRenderer(n_feat=32, input_dim=C, img_size=64, min_feat=8)
    hp = head.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, patch, patch, C)))["params"]
    state = create_neural2d_state(k3, params, pc, hp, cfg)
    step = make_neural2d_step(cfg, head, patch)

    campos, rot, K = ring_cameras(n_views=1, wh=(64, 64), focal=64.0)[0]
    rng = np.random.RandomState(0)
    for i in range(steps):
        x0, y0 = rng.randint(0, 64 - patch, 2)
        gx, gy = np.meshgrid(np.arange(x0, x0 + patch),
                             np.arange(y0, y0 + patch))
        pix = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
        from ..camera import get_dtu_raydir
        raydir = get_dtu_raydir(pix, K, rot, True).astype(np.float32)
        from ..data.synthetic import sphere_gt_render
        gt = sphere_gt_render(campos, raydir).reshape(patch, patch, 3)
        batch = RayBatch(
            campos=jnp.asarray(campos), camrotc2w=jnp.asarray(rot),
            raydir=jnp.asarray(raydir),
            pixel_idx=jnp.asarray(pix, jnp.int32),
            near=jnp.asarray(cfg.render.near_plane),
            far=jnp.asarray(cfg.render.far_plane), gt_image=None)
        state, items = step(state, st, grid, batch, jnp.asarray(gt),
                            jnp.asarray(0))
        if i % 10 == 0 or i == steps - 1:
            print(f"[n2d] step {i}: loss={float(items['loss_total']):.5f} "
                  f"psnr={float(items['psnr']):.2f}")
    return state


def mvs_init_cloud(ds, mvs_variables=None, n_groups: int = 8,
                   point_features_dim: int = 32,
                   depth_conf_thresh: float = 0.8,
                   geo_cnsst_num: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
    """MVS-based scene point initialization from a dataset's view groups
    (reference gen_points_filter_embeddings). `mvs_variables` should come
    from a feed-forward-trained MvsPointsInit (train/feedforward.py); fresh
    weights still yield a geometrically filtered, trainable cloud."""
    from ..mvs.points_init import (MvsPointsInit, gen_scene_points,
                                   init_mvs_points)
    g0 = ds.get_mvs_item(0)
    V, H, W = g0["images"].shape[:3]
    model = MvsPointsInit(point_features_dim=point_features_dim)
    if mvs_variables is None:
        mvs_variables = init_mvs_points(model, jax.random.PRNGKey(0),
                                        V=V, H=H, W=W)
    outs = []
    for gi in range(min(n_groups, len(ds))):
        g = ds.get_mvs_item(gi)
        gc = geo_cnsst_num if geo_cnsst_num is not None else \
            min(3, g["images"].shape[0] - 1)
        out = gen_scene_points(
            mvs_variables["params"], model, g["images"], g["Ks"], g["w2cs"],
            (float(g["depth_values"][0]), float(g["depth_values"][-1])),
            n_depths=min(64, len(g["depth_values"])),
            depth_conf_thresh=depth_conf_thresh, geo_cnsst_num=gc,
            batch_stats=mvs_variables.get("batch_stats"))
        outs.append(out)
    return {
        "xyz": np.concatenate([o["xyz"] for o in outs]),
        "feature": np.concatenate([o["embedding"] for o in outs]),
        "color": np.concatenate([o["color"] for o in outs]),
        "normal": np.concatenate([o["dirs"] for o in outs]),
        "conf": np.concatenate([o["conf"] for o in outs]),
    }


def train_dataset_scene(dataset_name: str, data_root: str, scan: str,
                        run_dir: str, max_steps: Optional[int] = None,
                        cfg: Optional[PointNeRFConfig] = None,
                        resume: bool = True,
                        mvs_init_kwargs: Optional[Dict] = None):
    """Per-scene optimization on a real dataset (run/train_ft.py main path):
    load the init cloud, auto-size the query config from its AABB, sample
    `random_sample_size²` rays per step, evaluate on the test split."""
    from ..config import DataConfig, scene_config
    from ..data import find_dataset_class_by_name

    dcfg = DataConfig(dataset_name=dataset_name, data_root=data_root,
                      scan=scan)
    cls = find_dataset_class_by_name(dataset_name)
    train_ds = cls(dcfg, split="train")
    test_ds = cls(dcfg, split="test")

    try:
        cloud = train_ds.load_init_points()
    except (FileNotFoundError, AttributeError):
        # no PLY/sensor cloud: MVS initialization (the reference's
        # gen_points_filter_embeddings path, run/train_ft.py:54-170) for
        # datasets exposing MVS view groups (data/dtu.py)
        if not hasattr(train_ds, "get_mvs_item"):
            raise
        cloud = mvs_init_cloud(train_ds, **(mvs_init_kwargs or {}))
    xyz = cloud["xyz"]
    if cfg is None:
        cfg = scene_config(xyz, near=float(train_ds.near),
                           far=float(train_ds.far))
    # voxel-downsample the raw cloud like the reference init
    # (construct_vox_points_closest, run/train_ft.py:141-147)
    from ..ops.voxel import construct_vox_points_closest
    if xyz.shape[0] > 2_000_000:
        idx, _ = construct_vox_points_closest(xyz, cfg.points.vox_res)
        xyz = xyz[idx]
        cloud = {k: v[idx] for k, v in cloud.items()}
    color = cloud.get("color")
    normals = cloud.get("normal")

    wh = (train_ds.width, train_ds.height)
    rng = np.random.RandomState(cfg.train.seed)

    def train_item(step):
        i = rng.randint(0, len(train_ds))
        return train_ds.get_item(i, random_sample=cfg.train.random_sample,
                                 random_sample_size=cfg.train.random_sample_size,
                                 seed=step)

    test_items = [test_ds.get_item(i) for i in
                  range(0, len(test_ds), max(1, len(test_ds) // 8))]
    probe_items = [train_ds.get_item(i) for i in
                   range(0, len(train_ds), max(1, len(train_ds) // 4))]
    return train_scene(cfg, (xyz, color, normals), train_item, test_items,
                       probe_items, wh, run_dir=run_dir, max_steps=max_steps,
                       resume=resume, features=cloud.get("feature"),
                       conf=cloud.get("conf"))


def test_dataset_scene(dataset_name: str, data_root: str, scan: str,
                       run_dir: str, cfg: Optional[PointNeRFConfig] = None,
                       save_images: bool = True):
    """Test-only evaluation from the latest checkpoint (run/test_ft.py):
    render the full test split, report PSNR/SSIM, save images."""
    from ..config import DataConfig, scene_config
    from ..data import find_dataset_class_by_name
    from ..models.aggregator import init_aggregator_params
    from ..models.points import make_point_cloud

    dcfg = DataConfig(dataset_name=dataset_name, data_root=data_root,
                      scan=scan)
    cls = find_dataset_class_by_name(dataset_name)
    train_ds = cls(dcfg, split="train")
    test_ds = cls(dcfg, split="test")
    cloud = train_ds.load_init_points()
    if cfg is None:
        cfg = scene_config(cloud["xyz"], near=float(train_ds.near),
                           far=float(train_ds.far))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.train.seed), 3)
    pc, st = make_point_cloud(cloud["xyz"], k1, cfg.points,
                              cfg.agg.point_features_dim,
                              color=cloud.get("color"),
                              dirs=cloud.get("normal"))
    state = create_train_state(k3, init_mlp_params(k2, cfg), pc,
                               cfg)
    path = latest_checkpoint(run_dir)
    if path is None:
        raise SystemExit(f"no checkpoint under {run_dir}")
    state, meta = load_checkpoint(path, state)
    if meta.get("num_active") is not None:
        st = st._replace(num_active=jnp.asarray(meta["num_active"], jnp.int32))
    grid = refresh_grid(state.params["points"], st, cfg)
    vis = Visualizer(run_dir, name="test")
    items = [test_ds.get_item(i) for i in range(len(test_ds))]
    m = evaluate(state.params, st, grid, cfg, items,
                 (test_ds.width, test_ds.height), vis, int(state.step),
                 save_images=save_images)
    print(f"[test] step {int(state.step)}: psnr={m['psnr']:.2f} "
          f"ssim={m['ssim']:.4f} over {len(items)} frames")
    return m


def render_video_from_checkpoint(dataset_name: str, data_root: str,
                                 scan: str, run_dir: str,
                                 cfg: Optional[PointNeRFConfig] = None,
                                 n_frames: int = 40, fps: int = 12):
    """Spiral video from the latest checkpoint (run/render_vid.py): uses the
    dataset's get_dummyrot_item render path."""
    from ..config import DataConfig, scene_config
    from ..data import find_dataset_class_by_name
    from ..models.aggregator import init_aggregator_params
    from ..models.points import make_point_cloud

    dcfg = DataConfig(dataset_name=dataset_name, data_root=data_root,
                      scan=scan)
    ds = find_dataset_class_by_name(dataset_name)(dcfg, split="train")
    if not hasattr(ds, "get_dummyrot_item"):
        raise SystemExit(f"{dataset_name} has no spiral render path")
    cloud = ds.load_init_points()
    if cfg is None:
        cfg = scene_config(cloud["xyz"], near=float(ds.near),
                           far=float(ds.far))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(cfg.train.seed), 3)
    pc, st = make_point_cloud(cloud["xyz"], k1, cfg.points,
                              cfg.agg.point_features_dim,
                              color=cloud.get("color"),
                              dirs=cloud.get("normal"))
    state = create_train_state(k3, init_mlp_params(k2, cfg), pc,
                               cfg)
    path = latest_checkpoint(run_dir)
    if path is None:
        raise SystemExit(f"no checkpoint under {run_dir}")
    state, meta = load_checkpoint(path, state)
    if meta.get("num_active") is not None:
        st = st._replace(num_active=jnp.asarray(meta["num_active"], jnp.int32))
    grid = refresh_grid(state.params["points"], st, cfg)
    items = [ds.get_dummyrot_item(i, n_frames=n_frames)
             for i in range(n_frames)]
    out = render_video(state.params, st, grid, cfg, items,
                       (ds.width, ds.height), run_dir)
    print("video:", out)
    return out


def train_feedforward_dataset(data_root: str, scan: str, run_dir: str,
                              max_steps: int = 1000,
                              cfg: Optional[PointNeRFConfig] = None,
                              nsrc: int = 2, n_depths: int = 48,
                              n_rays: int = 1024, log_every: int = 50):
    """Generalization training on a DTU-format dataset — the run/train.py
    path (mode 0): per step, one MVS view group builds a fresh differentiable
    cloud and target-view rays supervise both the shading MLPs and the MVS
    nets (train/feedforward.py)."""
    from ..config import DataConfig, scene_config
    from ..data import find_dataset_class_by_name
    from ..models.aggregator import init_aggregator_params
    from ..mvs.points_init import MvsPointsInit, init_mvs_points, view_proj_mats
    from .feedforward import MVSBatch, create_ff_state, make_feedforward_step

    dcfg = DataConfig(dataset_name="dtu", data_root=data_root, scan=scan)
    ds = find_dataset_class_by_name("dtu")(dcfg, split="train", nsrc=nsrc,
                                           n_depths=n_depths)
    g0 = ds.get_mvs_item(0)
    V, H, W = g0["images"].shape[:3]
    if cfg is None:
        near, far = float(g0["depth_values"][0]), float(g0["depth_values"][-1])
        span = far - near
        center = 0.0  # scene AABB unknown a priori: derive from frustum
        cfg = scene_config(np.array([[-span, -span, -span],
                                     [span, span, span]], np.float32),
                           near=near, far=far)
    model = MvsPointsInit(point_features_dim=cfg.agg.point_features_dim)
    variables = init_mvs_points(model, jax.random.PRNGKey(0), V=V, H=H, W=W,
                                n_depths=n_depths)
    agg_params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    state = create_ff_state(jax.random.PRNGKey(2), variables, agg_params, cfg)
    capacity = (H // 4) * (W // 4)
    step_fn, infer_cloud = make_feedforward_step(cfg, model,
                                                 capacity=capacity)
    vis = Visualizer(run_dir, name="feedforward")
    rng = np.random.RandomState(cfg.train.seed)
    for i in range(max_steps):
        gi = rng.randint(0, len(ds))
        g = ds.get_mvs_item(gi)
        item = ds.get_item(gi, random_sample="random",
                           random_sample_size=int(np.sqrt(n_rays)), seed=i)
        rays = _to_batch(item, cfg)
        batch = MVSBatch(
            images=jnp.asarray(g["images"]),
            proj_mats=jnp.asarray(view_proj_mats(g["Ks"], g["w2cs"], 0)),
            Ks=jnp.asarray(g["Ks"]), w2cs=jnp.asarray(g["w2cs"]),
            depth_values=jnp.asarray(g["depth_values"]), rays=rays)
        state, items = step_fn(state, batch)
        vis.accumulate_losses(items)
        if (i + 1) % log_every == 0:
            vis.print_losses(i + 1)
    return state, infer_cloud


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--test", action="store_true",
                    help="evaluate the latest checkpoint on the test split "
                         "(use with --dataset/--data-root/--scan)")
    ap.add_argument("--n2d-demo", action="store_true",
                    help="feature rendering + 2D neural-render head demo")
    ap.add_argument("--ff-demo", action="store_true",
                    help="feed-forward (MVS generalization) demo")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--run-dir", default="runs/demo")
    ap.add_argument("--platform", default=None,
                    help="cpu|axon — overrides the sitecustomize-baked "
                         "JAX platform")
    ap.add_argument("--dataset", default=None,
                    help="real-data per-scene training: dataset name "
                         "(nerf_synth360_ft | tt_ft | scannet_ft | llff_ft)")
    ap.add_argument("--data-root", default="")
    ap.add_argument("--scan", default="lego")
    ap.add_argument("--video", action="store_true",
                    help="render a spiral video from the latest checkpoint "
                         "(use with --dataset/--data-root/--scan)")
    ap.add_argument("--ff-dataset", action="store_true",
                    help="feed-forward generalization training on a "
                         "DTU-format --data-root/--scan (run/train.py mode)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dataset and args.video:
        render_video_from_checkpoint(args.dataset, args.data_root, args.scan,
                                     run_dir=args.run_dir)
    elif args.ff_dataset:
        train_feedforward_dataset(args.data_root, args.scan,
                                  run_dir=args.run_dir, max_steps=args.steps)
    elif args.dataset and args.test:
        test_dataset_scene(args.dataset, args.data_root, args.scan,
                           run_dir=args.run_dir)
    elif args.dataset:
        train_dataset_scene(args.dataset, args.data_root, args.scan,
                            run_dir=args.run_dir, max_steps=args.steps)
    elif args.demo:
        demo(steps=args.steps, run_dir=args.run_dir)
    elif args.ff_demo:
        ff_demo(steps=min(args.steps, 50))
    elif args.n2d_demo:
        n2d_demo(steps=min(args.steps, 100))
    else:
        ap.error("use --demo or --ff-demo; use train_scene() from code for "
                 "real datasets")


if __name__ == "__main__":
    main()
