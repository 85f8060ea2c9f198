"""On-chip sharded-path benchmark: make_sharded_train_step as a (1,1) mesh
on the single real TPU at the lego budget, next to the unsharded bench.

VERDICT r2 next #3: the sharding machinery (shard_map dispatch, the
compaction-per-ray-block bookkeeping, degenerate all_to_all/psum/pmean
collectives, mesh-placed optimizer state) should cost <10% vs the unsharded
train_step — this measures it. Multi-chip scaling itself is validated on
the virtual mesh (dryrun_multichip); this bounds the machinery overhead on
real hardware.

Usage: python scripts/bench_sharded.py [--iters 20] [--dp 1 --mp 1]
Prints one JSON line with sharded rays/s (and the unsharded number for the
same process/session when --with-unsharded is set).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N_RAYS = 3600
N_POINTS = 65536


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--mp", type=int, default=1)
    ap.add_argument("--with-unsharded", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-runnable smoke (tiny_test_config shapes)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from __graft_entry__ import _batch, _scene_state
    from pointnerf_tpu.config import (bench_config, jit_canonical,
                                      tiny_test_config)
    from pointnerf_tpu.parallel import (build_sharded_scene,
                                        create_sharded_train_state,
                                        make_mesh, make_sharded_train_step,
                                        partition_points)

    global N_RAYS, N_POINTS
    n_rays, n_points = N_RAYS, N_POINTS
    if args.tiny:
        import dataclasses
        cfg = tiny_test_config()
        cfg = cfg.replace(query=dataclasses.replace(
            cfg.query, shell_layered=False, P=64, decode_capacity=0.5,
            prebuild_neighbors=True))
        n_rays, n_points = 256, 2048
    else:
        cfg = bench_config()
    jcfg = jit_canonical(cfg)
    pc, st, params, grid = _scene_state(cfg, n_pts=n_points)
    batch = _batch(cfg, n_rays=n_rays)
    N_RAYS, N_POINTS = n_rays, n_points

    result = {"rays": N_RAYS, "points": N_POINTS,
              "mesh": [args.dp, args.mp]}
    # numpy copies before the unsharded bench: train_step donates its state
    # (including the point cloud buffers)
    n = N_POINTS
    pc_np = {k: np.asarray(getattr(pc, k)[:n])
             for k in ("xyz", "features", "color", "dirs", "conf")}
    params_np = jax.tree.map(np.asarray, params)

    if args.with_unsharded:
        from pointnerf_tpu.train.step import create_train_state, train_step
        state = create_train_state(jax.random.PRNGKey(0), params, pc, jcfg)
        for _ in range(args.warmup):
            state, items = train_step(state, st, grid, batch, jcfg)
        jax.block_until_ready(items["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, items = train_step(state, st, grid, batch, jcfg)
        jax.block_until_ready(items["loss_total"])
        dt = time.perf_counter() - t0
        result["unsharded_rays_per_sec"] = round(N_RAYS * args.iters / dt, 1)
        del state

    mesh = make_mesh(dp=args.dp, mp=args.mp)
    pc_s, num_active = partition_points(
        pc_np["xyz"], jax.random.PRNGKey(0), jcfg, mp=args.mp,
        features=pc_np["features"], color=pc_np["color"],
        dirs=pc_np["dirs"], conf=pc_np["conf"])
    scene = build_sharded_scene(pc_s, num_active, jcfg, mesh)
    state_s, scene = create_sharded_train_state(
        jax.random.PRNGKey(1), jax.tree.map(jax.numpy.asarray, params_np),
        pc_s, scene, jcfg, mesh)
    step = make_sharded_train_step(jcfg, mesh)

    for _ in range(args.warmup):
        state_s, items = step(state_s, scene, batch)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state_s, items = step(state_s, scene, batch)
    jax.block_until_ready(items["loss_total"])
    dt = time.perf_counter() - t0
    result["sharded_rays_per_sec"] = round(N_RAYS * args.iters / dt, 1)
    assert np.isfinite(float(items["loss_total"]))
    if "unsharded_rays_per_sec" in result:
        result["sharded_overhead_pct"] = round(
            100.0 * (result["unsharded_rays_per_sec"]
                     / result["sharded_rays_per_sec"] - 1.0), 1)
    print(json.dumps({"bench_sharded": result}))


if __name__ == "__main__":
    main()
