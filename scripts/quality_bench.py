"""Quality benchmark: time-to-PSNR on the procedural multi-object scenes.

Trains the per-scene pipeline at the reference lego budget (3,600 rays/iter,
D=400 -> SR=80 -> K=8, probe-grow cadence scaled from dev_scripts/w_n360/
lego.sh:55-160; pruning OFF by default — see build_config) on a procedural
scene with analytic 800x800 GT
(pointnerf_tpu/data/procedural.py) and records the wall-clock-to-PSNR curve
on held-out views (BASELINE.json north star: time-to-PSNR-30 on lego;
VERDICT r1 next #4).

Writes QUALITY_<scene>.json with the eval history and prints a summary line.

Usage:
  python scripts/quality_bench.py cluster --steps 30000 --target 30
  python scripts/quality_bench.py thicket --steps 30000
Options: --views N (default 100) --wh W (default 800) --pts N (default
200000) --test-views N (default 6) --run-dir DIR
"""
import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from pointnerf_tpu.config import (ParallelConfig, QueryConfig,  # noqa: E402
                                  RenderConfig, TrainConfig, bench_config,
                                  ranges_from_cloud)
from pointnerf_tpu.data.procedural import (SCENES, sample_cloud,  # noqa: E402
                                           sphere_cameras, view_item)
from pointnerf_tpu.train.driver import train_scene  # noqa: E402


def build_config(xyz, steps: int, rays_side: int = 60,
                 prune_iter: int = -1, hit_boost: float = 0.0,
                 prune_min_hits: float = 0.0, fine: int = 0,
                 split_iter: int = 0, split_top: int = 512,
                 nerf_importance: int = 0):
    """Lego-budget config sized to the procedural scene AABB. Cadences scale
    with the step budget relative to the reference's 200k-step schedule
    (probe every 10001; lego.sh:55-160).

    Pruning is DISABLED by default (prune_iter=-1): the procedural cloud is
    an exact surface sampling with no MVS noise to remove, and a scaled-down
    schedule prunes thin structures before their per-point confidence has
    received enough ray hits (the cluster run's sticks vanished at the first
    prune). The reference makes the same per-scene call — chair, drums,
    materials, and mic ship with pruning off (presets.py). Pass a positive
    prune_iter to re-enable."""
    cfg = bench_config()
    r = ranges_from_cloud(xyz)
    span = max(r[3] - r[0], r[4] - r[1], r[5] - r[2])
    v = span / 320.0                       # vox_res=320 like lego.sh:17
    scale = steps / 200_000.0
    prob_freq = max(501, int(10001 * scale) + 1)
    cam_r = 2.4
    cfg = cfg.replace(
        query=dataclasses.replace(
            cfg.query, vsize=(v, v, v), ranges=r, max_o=262144,
            # quality-scale clouds dilate to ~210k occupied cells; the bench
            # default max_d=131072 TRUNCATED the neighbor tables (37% of
            # cells had no row — one side of the scene silently found no
            # neighbors, capping round-2/3 PSNR). Size the envelope to max_o.
            max_d=262144,
            # multi-object scenes fill more of the frame than the bench
            # sphere: give the compacted decode 40% capacity (watch the
            # n_decode_dropped log line; 0 in the recorded runs)
            decode_capacity=0.4),
        render=dataclasses.replace(
            cfg.render, near_plane=cam_r - 0.75 * span,
            far_plane=cam_r + 0.75 * span, fine_sample_num=fine,
            nerf_importance=nerf_importance),
        train=dataclasses.replace(
            cfg.train, maximum_step=steps, random_sample_size=rays_side,
            prune_iter=prune_iter, prune_max_iter=int(steps * 0.65),
            prob_freq=prob_freq, test_freq=max(250, steps // 40),
            print_freq=200, save_iter_freq=max(1000, steps // 10),
            hit_lr_boost=hit_boost, prune_min_hits=prune_min_hits,
            split_iter=split_iter, split_top=split_top,
            # quality runs always track: eval hits_pct percentiles
            # calibrate prune_min_hits (PERF.md protocol)
            track_hits=True),
        parallel=ParallelConfig(remat=False))
    # honor the same perf A/B knobs as bench.py (shared reader) so quality
    # runs ride whichever selection mode the on-chip A/B picked
    from pointnerf_tpu.config import apply_bench_env_knobs
    return apply_bench_env_knobs(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", choices=sorted(SCENES), nargs="?",
                    default="cluster")
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--target", type=float, default=None)
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--pts", type=int, default=200_000)
    ap.add_argument("--test-views", type=int, default=16,
                    help="held-out views per eval (16 = the hardened "
                         "protocol; 800x800 evals cost ~10s/view on chip)")
    ap.add_argument("--test-freq", type=int, default=None,
                    help="override the eval cadence (default steps//12 at "
                         ">=8 test views, steps//40 below)")
    ap.add_argument("--prune-iter", type=int, default=-1,
                    help="prune cadence in steps; <=0 disables (default: "
                         "off — exact-surface procedural clouds have no "
                         "noise to prune)")
    ap.add_argument("--rays-side", type=int, default=60,
                    help="rays/step = side^2 (60 = the reference lego "
                         "budget)")
    ap.add_argument("--importance", type=float, default=0.0,
                    help="loss-aware ray importance sampling: fraction of "
                         "each batch drawn from high-error cells "
                         "(0 disables; 0.5 = half importance half uniform)")
    ap.add_argument("--hit-boost", type=float, default=0.0,
                    help="max per-point update boost for under-hit payloads "
                         "(TrainConfig.hit_lr_boost; <=1 disables)")
    ap.add_argument("--prune-min-hits", type=float, default=0.0,
                    help="prune exemption floor on cumulative neighbor hits "
                         "(TrainConfig.prune_min_hits)")
    ap.add_argument("--nerf-importance", type=int, default=0,
                    help="proposal-NeRF hybrid samples per ray "
                         "(RenderConfig.nerf_importance; 0 disables)")
    ap.add_argument("--nerf-create-points", action="store_true",
                    help="probe-grow also converts confident radiance-field "
                         "mass into new points (TrainConfig."
                         "nerf_create_points; needs --nerf-importance > 0)")
    ap.add_argument("--drop-prims", default="",
                    help="comma-separated primitive indices EXCLUDED from "
                         "the init cloud (the geometry still renders in GT) "
                         "— simulates MVS coverage holes, the regime the "
                         "reference's NeRF hybrid exists for "
                         "(neural_points_volumetric_multiseq_model.py:290+)")
    ap.add_argument("--prob-freq", type=int, default=0,
                    help="override the probe-grow cadence (0 keeps the "
                         "schedule-scaled default; <0 disables probes)")
    ap.add_argument("--split-iter", type=int, default=0,
                    help="gradient-driven point-splitting cadence "
                         "(TrainConfig.split_iter; 0 disables)")
    ap.add_argument("--split-top", type=int, default=512,
                    help="max points cloned per split event")
    ap.add_argument("--fine", type=int, default=0,
                    help="hierarchical fine samples per ray "
                         "(RenderConfig.fine_sample_num; 0 disables)")
    ap.add_argument("--feat-dim", type=int, default=0,
                    help="override point_features_dim (capacity sweep; "
                         "0 keeps the default)")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the run dir's latest checkpoint "
                         "(extends a finished run: pass a larger --steps)")
    ap.add_argument("--tag", default="",
                    help="suffix for QUALITY_<scene>_<tag>.json and the "
                         "default run dir (keeps lever A/Bs separate)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-runnable smoke: shrink the query budget")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    prims = SCENES[args.scene]()
    cloud_prims = prims
    if args.drop_prims:
        drop = {int(i) for i in args.drop_prims.split(",")}
        cloud_prims = [p for i, p in enumerate(prims) if i not in drop]
        print(f"[quality] init cloud EXCLUDES prims {sorted(drop)} "
              f"({len(cloud_prims)}/{len(prims)} sampled; GT renders all)")
    xyz, color, normals = sample_cloud(cloud_prims, args.pts, seed=0)
    wh = (args.wh, args.wh)
    cfg = build_config(xyz, args.steps, rays_side=args.rays_side,
                       prune_iter=args.prune_iter, hit_boost=args.hit_boost,
                       prune_min_hits=args.prune_min_hits, fine=args.fine,
                       split_iter=args.split_iter, split_top=args.split_top,
                       nerf_importance=args.nerf_importance)
    if args.feat_dim:
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, point_features_dim=args.feat_dim))
    if args.nerf_create_points:
        assert args.nerf_importance > 0, "--nerf-create-points needs the hybrid"
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, nerf_create_points=True))
    if args.tiny:
        cfg = cfg.replace(
            query=dataclasses.replace(
                cfg.query, vsize=tuple(v * 8 for v in cfg.query.vsize),
                max_o=8192, P=8, K=4, SR=16, z_depth_dim=64,
                knn_chunk=8192, max_d=8192),
            train=dataclasses.replace(cfg.train, random_sample_size=12,
                                      compute_dtype="f32",
                                      test_freq=max(1, args.steps // 3),
                                      prune_iter=max(1, args.steps // 2),
                                      prob_freq=max(2, args.steps // 2 + 1)))
    if args.nerf_importance > 0:
        # the merged hybrid color lives in coarse_raycolor: supervise it on
        # ALL rays (miss rays are exactly where the radiance field learns)
        # + aux loss on the proposal pass
        cfg = cfg.replace(loss=dataclasses.replace(
            cfg.loss,
            color_loss_items=("ray_masked_coarse_raycolor",
                              "coarse_raycolor", "nerf_coarse_raycolor"),
            color_loss_weights=(1.0, 1.0, 0.5)))
    if args.prob_freq:
        pf = args.prob_freq if args.prob_freq > 0 else 0
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    prob_freq=pf))
    if args.test_freq:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    test_freq=args.test_freq))
    elif args.test_views >= 8 and not args.tiny:
        # many-view evals are expensive: fewer, denser checkpoints
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, test_freq=max(500, args.steps // 12)))
    suffix = f"_{args.tag}" if args.tag else ""
    run_dir = args.run_dir or f"runs/quality_{args.scene}{suffix}"

    train_views = sphere_cameras(args.views, radius=2.4,
                                 focal=875.0 * args.wh / 800.0, wh=wh,
                                 seed=0)
    test_views = sphere_cameras(args.test_views, radius=2.4,
                                focal=875.0 * args.wh / 800.0, wh=wh,
                                seed=99)
    rng = np.random.RandomState(cfg.train.seed)
    n_rays = cfg.train.random_sample_size ** 2

    sampler = None
    if args.importance > 0:
        from pointnerf_tpu.train.sampler import ErrorMapSampler
        sampler = ErrorMapSampler(len(train_views), wh,
                                  uniform_frac=1.0 - args.importance)

    def train_item(step):
        i = rng.randint(0, len(train_views))
        campos, rot, K = train_views[i]
        pixels = (sampler.sample_pixels(i, n_rays, rng)
                  if sampler is not None else None)
        return view_item(prims, campos, rot, K, wh, n_rays=n_rays,
                         seed=step, view_id=i, pixels=pixels)

    print(f"[quality] scene={args.scene} pts={xyz.shape[0]} "
          f"views={args.views}@{args.wh} steps={args.steps} "
          f"vsize={cfg.query.vsize[0]:.4f}")
    test_items = [view_item(prims, *v, wh, view_id=1000 + i)
                  for i, v in enumerate(test_views)]
    probe_items = [view_item(prims, *train_views[i], wh, view_id=i)
                   for i in range(0, len(train_views),
                                  max(1, len(train_views) // 8))]

    state, st, hist = train_scene(
        cfg, (xyz, color, normals), train_item, test_items, probe_items, wh,
        run_dir=run_dir, max_steps=args.steps, target_psnr=args.target,
        resume=args.resume, sampler=sampler)

    out = {"scene": args.scene, "steps": args.steps, "n_points": int(xyz.shape[0]),
           "views": args.views, "wh": args.wh,
           "eval": hist["eval"],
           "rays_per_step": n_rays,
           "levers": {"importance": args.importance,
                      "hit_boost": args.hit_boost,
                      "prune_min_hits": args.prune_min_hits,
                      "fine": args.fine, "prune_iter": args.prune_iter,
                      "split_iter": args.split_iter,
                      "nerf_importance": args.nerf_importance,
                      "nerf_create_points": bool(args.nerf_create_points),
                      "prob_freq": args.prob_freq,
                      "drop_prims": args.drop_prims}}
    path = f"QUALITY_{args.scene}{suffix}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    best = max((e["psnr"] for e in hist["eval"]), default=float("nan"))
    print(json.dumps({"scene": args.scene, "best_psnr": round(best, 2),
                      "evals": len(hist["eval"]), "out": path}))


if __name__ == "__main__":
    main()
