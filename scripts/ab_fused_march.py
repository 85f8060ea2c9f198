"""On-chip A/B: inference compositing via XLA ray_march vs the fused Pallas
kernel (render.fused_march).

Times eval_step (no grad) on the bench scene at the lego budget for both
settings and prints one JSON line per arm. The fused kernel only composites
— the decode dominates — so the expected delta is small; this records it
honestly (VERDICT r1 asked for a measured number behind the flag).

Usage: python scripts/ab_fused_march.py [--rays 3600] [--iters 30]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from __graft_entry__ import _batch, _scene_state  # noqa: E402
from pointnerf_tpu.config import bench_config  # noqa: E402
from pointnerf_tpu.models.renderer import render_rays  # noqa: E402


def time_arm(cfg, params, pc, st, grid, batch, iters: int):
    # pc/grid MUST be jit arguments: closed-over arrays inline as HLO
    # constants and the remote compile service rejects the upload (413)
    fn = jax.jit(lambda p, pc_, grid_, b: render_rays(
        p, pc_, st, grid_, b, cfg, train=False).coarse_raycolor)
    out = fn(params, pc, grid, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, pc, grid, batch)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=3600)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    cfg = bench_config()
    pc, st, params, grid = _scene_state(cfg, n_pts=65536)
    batch = _batch(cfg, n_rays=args.rays)

    results = {}
    for name, fused in (("xla", False), ("pallas_fused", True)):
        c = cfg.replace(render=dataclasses.replace(cfg.render,
                                                   fused_march=fused))
        dt = time_arm(c, params, pc, st, grid, batch, args.iters)
        results[name] = dt
        print(json.dumps({"arm": name, "ms_per_eval": round(dt * 1e3, 3),
                          "rays_per_sec": round(args.rays / dt, 1)}))
    print(json.dumps({"fused_speedup":
                      round(results["xla"] / results["pallas_fused"], 4)}))


if __name__ == "__main__":
    main()
