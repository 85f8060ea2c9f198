"""Dump the optimized HLO of the bench-config train step (compile-cached)
and print a categorized cost summary of named fusions.

Usage: python scripts/dump_hlo.py [out.txt]
"""
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _batch, _scene_state  # noqa: E402
from pointnerf_tpu.config import bench_config  # noqa: E402
from pointnerf_tpu.train.step import create_train_state, train_step  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_step_hlo.txt"
    cfg = bench_config()
    pc, st, params, grid = _scene_state(cfg, n_pts=65536)
    state = create_train_state(jax.random.PRNGKey(0), params, pc, cfg)
    batch = _batch(cfg, n_rays=3600)

    lowered = jax.jit(
        lambda s, stat, g, b: train_step(s, stat, g, b, cfg)
    ).lower(state, st, grid, batch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")
    try:
        for m in compiled.cost_analysis():
            print({k: v for k, v in m.items()
                   if k in ("flops", "bytes accessed")})
    except Exception as e:
        print("cost_analysis failed:", e)


if __name__ == "__main__":
    main()
