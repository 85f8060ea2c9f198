"""Minimal on-chip repro/bisect for the round-4 INVALID_ARGUMENT poison.

Both round-4 crashes (runs/hole_nerf2.log, runs/thicket_levers.log) follow
the same shape: a grow/split event that ADDS points at the quality scale
(200k pts, max_d=262144 => ~1GB neighbor tables), after which the NEXT
host<->device transfer dies with an async TPU-backend INVALID_ARGUMENT.
Both adds crossed the capacity bucket (200704 -> 204800), forcing a
train_step recompile against freshly `_row_major`-committed grid tables.

This script replays exactly that sequence in ~2 minutes instead of the
10-minute quality_bench repro, with each suspect toggleable:

  python scripts/repro_grow_crash.py                 # default: re-bucket grow
  python scripts/repro_grow_crash.py --no-rowmajor   # _row_major disabled
  python scripts/repro_grow_crash.py --add 100       # no capacity re-bucket
  python scripts/repro_grow_crash.py --probe --nerf 8  # real probe_hole path

Prints PASS/observed-exception at the end.
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from pointnerf_tpu.data.procedural import SCENES, sample_cloud, \
    sphere_cameras, view_item  # noqa: E402
from pointnerf_tpu.models.points import make_point_cloud  # noqa: E402
from pointnerf_tpu.train import step as step_mod  # noqa: E402
from pointnerf_tpu.train.driver import _to_batch, init_mlp_params  # noqa: E402
from pointnerf_tpu.train.grow import (ProbeCandidates, apply_grow,  # noqa: E402
                                      probe_hole)
from pointnerf_tpu.train.step import (create_train_state,  # noqa: E402
                                      refresh_grid, train_step)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quality_bench import build_config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--add", type=int, default=2000,
                    help="synthetic points to grow (2000 crosses the "
                         "200704 capacity bucket; 100 stays inside)")
    ap.add_argument("--no-rowmajor", action="store_true",
                    help="disable the _row_major layout pin")
    ap.add_argument("--probe", action="store_true",
                    help="grow via the real probe_hole render instead of "
                         "synthetic candidates")
    ap.add_argument("--nerf", type=int, default=0,
                    help="RenderConfig.nerf_importance")
    ap.add_argument("--wh", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    if args.no_rowmajor:
        step_mod._row_major = lambda a: a
        print("[repro] _row_major DISABLED")

    prims = SCENES["cluster"]()
    cloud_prims = [p for i, p in enumerate(prims) if i not in (1, 4)]
    xyz, color, normals = sample_cloud(cloud_prims, 200_000, seed=0)
    cfg = build_config(xyz, 30000, nerf_importance=args.nerf)
    if args.nerf > 0:
        cfg = cfg.replace(loss=dataclasses.replace(
            cfg.loss,
            color_loss_items=("ray_masked_coarse_raycolor",
                              "coarse_raycolor", "nerf_coarse_raycolor"),
            color_loss_weights=(1.0, 1.0, 0.5)))
    wh = (args.wh, args.wh)
    views = sphere_cameras(4, radius=2.4, focal=875.0 * args.wh / 800.0,
                           wh=wh, seed=0)
    items = [view_item(prims, *v, wh, n_rays=cfg.train.random_sample_size ** 2,
                       seed=i, view_id=i) for i, v in enumerate(views)]
    probe_frames = [view_item(prims, *views[0], wh, view_id=0)]

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points,
                              cfg.agg.point_features_dim,
                              color=color, dirs=normals)
    params = init_mlp_params(k2, cfg)
    state = create_train_state(k3, params, pc, cfg)
    from pointnerf_tpu.config import jit_canonical
    jcfg = jit_canonical(cfg)
    grid = refresh_grid(state.params["points"], st, cfg)
    print(f"[repro] capacity={pc.capacity} active={int(st.num_active)} "
          f"num_dil={int(grid.num_dil)}")

    t0 = time.time()
    for i in range(args.warmup):
        batch = _to_batch(items[i % len(items)], cfg)
        state, metrics = train_step(state, st, grid, batch, jcfg)
    print(f"[repro] warmup loss={float(metrics['loss_total']):.4f} "
          f"t={time.time() - t0:.1f}s")

    if args.probe:
        cand = probe_hole(state.params, st, grid, cfg, probe_frames, wh)
        print(f"[repro] probe produced {cand.xyz.shape[0]} candidates")
        if args.add and cand.xyz.shape[0] < args.add:
            # top up with synthetic candidates to force the re-bucket
            extra = args.add - cand.xyz.shape[0]
            sel = np.random.RandomState(0).randint(0, xyz.shape[0], extra)
            F = cfg.agg.point_features_dim
            cand = ProbeCandidates(
                xyz=np.concatenate([cand.xyz, xyz[sel] + 0.001]),
                embedding=np.concatenate(
                    [cand.embedding,
                     np.zeros((extra, F), np.float32)]),
                color=np.concatenate([cand.color, color[sel]]),
                dirs=np.concatenate([cand.dirs, normals[sel]]),
                conf=np.concatenate(
                    [cand.conf, np.full((extra, 1), 0.5, np.float32)]))
    else:
        sel = np.random.RandomState(0).randint(0, xyz.shape[0], args.add)
        F = cfg.agg.point_features_dim
        cand = ProbeCandidates(
            xyz=(xyz[sel] + 0.001).astype(np.float32),
            embedding=np.zeros((args.add, F), np.float32),
            color=color[sel].astype(np.float32),
            dirs=normals[sel].astype(np.float32),
            conf=np.full((args.add, 1), 0.5, np.float32))

    old_cap = state.params["points"].capacity
    state, st, added = apply_grow(state, st, cand, cfg)
    new_cap = state.params["points"].capacity
    grid = refresh_grid(state.params["points"], st, cfg)
    print(f"[repro] grew +{added} (active {int(st.num_active)}), capacity "
          f"{old_cap} -> {new_cap} "
          f"({'RE-BUCKETED' if new_cap != old_cap else 'same bucket'})")

    try:
        t0 = time.time()
        for i in range(args.warmup):
            batch = _to_batch(items[i % len(items)], cfg)
            state, metrics = train_step(state, st, grid, batch, jcfg)
        loss = float(metrics["loss_total"])   # forces the sync
        print(f"[repro] post-grow loss={loss:.4f} t={time.time() - t0:.1f}s")
        print("PASS")
    except Exception as e:
        print(f"FAIL: {type(e).__name__}: {e}")
        raise


if __name__ == "__main__":
    main()
