"""Compare full-train-step throughput: XLA decode vs fused Pallas decode at
several tile sizes, on the real chip at the lego budget.

Uses the bench.py timing pattern (python loop, donated TrainState) — the
only wall-clock pattern that matches device traces on the axon tunnel.

Usage: python scripts/bench_fused.py [tile_fwd,tile_bwd ...]
       default variants: xla 1024,512 2048,1024 4096,2048
"""
import dataclasses
import json
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _batch, _scene_state  # noqa: E402
from pointnerf_tpu.config import bench_config  # noqa: E402
from pointnerf_tpu.train.step import create_train_state, train_step  # noqa: E402

N_RAYS, N_POINTS, WARMUP, ITERS = 3600, 65536, 3, 20


def run_variant(cfg):
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
    assert np.isfinite(float(items["loss_total"]))
    return N_RAYS * ITERS / dt, float(items["loss_total"])


def main():
    variants = sys.argv[1:] or ["xla", "1024,512", "2048,1024", "4096,2048"]
    base = bench_config()
    res = {}
    for v in variants:
        if v == "xla":
            cfg = base
        else:
            tf, tb = (int(x) for x in v.split(","))
            cfg = base.replace(agg=dataclasses.replace(
                base.agg, fused_decode=True, fused_tile=tf,
                fused_tile_bwd=tb))
        try:
            rate, loss = run_variant(cfg)
            res[v] = round(rate, 1)
            print(f"{v:12s} {rate:10.1f} rays/s  loss={loss:.4f}")
        except Exception as e:
            res[v] = f"error: {str(e)[:120]}"
            print(f"{v:12s} ERROR {str(e)[:200]}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
