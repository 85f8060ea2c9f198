"""Benchmark: training throughput (rays/sec, fwd+bwd+update) on one chip.

Runs the flagship per-scene optimization step at the reference lego budget
(3600 rays/iter, D=400 -> SR=80 -> K=8; dev_scripts/w_n360/lego.sh:51-66,
110-112) on a 65k-point synthetic sphere scene and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the first recorded run on this hardware
(BENCH_BASELINE.json, created on first execution) so round-over-round
improvement is visible; the reference repo publishes no numeric throughput
(SURVEY.md §6).
"""
from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# persistent compile cache: repeat bench runs skip the multi-minute XLA
# compiles (safe no-op when the dir is unavailable)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from __graft_entry__ import _batch, _scene_state
from pointnerf_tpu.config import bench_config
from pointnerf_tpu.train.step import create_train_state, train_step

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
N_RAYS = 3600
N_POINTS = 65536
WARMUP = 3
ITERS = 20


def main():
    cfg = bench_config()
    # optional A/B knobs (default bench behavior unchanged) — shared
    # reader, see config.apply_bench_env_knobs for the knob list
    from pointnerf_tpu.config import apply_bench_env_knobs
    cfg = apply_bench_env_knobs(cfg)
    pc, st, params, grid = _scene_state(cfg, n_pts=N_POINTS)
    state = create_train_state(jax.random.PRNGKey(0), params, pc, cfg)
    batch = _batch(cfg, n_rays=N_RAYS)

    for _ in range(WARMUP):
        state, items = train_step(state, st, grid, batch, cfg)
    jax.block_until_ready(items["loss_total"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, items = train_step(state, st, grid, batch, cfg)
    jax.block_until_ready(items["loss_total"])
    dt = time.perf_counter() - t0

    rays_per_sec = N_RAYS * ITERS / dt
    assert np.isfinite(float(items["loss_total"]))

    if os.path.exists(BASELINE_PATH):
        base = json.load(open(BASELINE_PATH))["rays_per_sec"]
    else:
        base = rays_per_sec
        with open(BASELINE_PATH, "w") as f:
            json.dump({"rays_per_sec": rays_per_sec,
                       "device": str(jax.devices()[0])}, f)
    print(json.dumps({
        "metric": "train_rays_per_sec_fwd_bwd",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / base, 3),
    }))


if __name__ == "__main__":
    main()
