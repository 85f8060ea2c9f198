"""Capture a device trace of the bench-config train step on the TPU and
print a per-op time breakdown (top HLO ops by self time).

Usage: python scripts/trace_step.py [outdir]
"""
import glob
import gzip
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _batch, _scene_state  # noqa: E402
from pointnerf_tpu.config import bench_config  # noqa: E402
from pointnerf_tpu.train.step import create_train_state, train_step  # noqa: E402
from pointnerf_tpu.utils.profiling import device_trace  # noqa: E402

N_RAYS = 3600
N_POINTS = 65536


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    cfg = bench_config()
    # same A/B knobs as bench.py (shared reader)
    from pointnerf_tpu.config import apply_bench_env_knobs
    cfg = apply_bench_env_knobs(cfg)
    pc, st, params, grid = _scene_state(cfg, n_pts=N_POINTS)
    state = create_train_state(jax.random.PRNGKey(0), params, pc, cfg)
    batch = _batch(cfg, n_rays=N_RAYS)

    for _ in range(3):
        state, items = train_step(state, st, grid, batch, cfg)
    jax.block_until_ready(items["loss_total"])

    with device_trace(outdir):
        for _ in range(5):
            state, items = train_step(state, st, grid, batch, cfg)
        jax.block_until_ready(items["loss_total"])

    # parse the trace: aggregate device-track event durations by op name
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {outdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-side track pids (TPU core tracks, not the host threads)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    print(f"\ntrace: {path}")
    print(f"device pids: { {p: pid_names[p] for p in device_pids} }")
    print(f"total device event time over 5 steps: {total:.1f} ms "
          f"({total / 5:.1f} ms/step)\n")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms / 5:9.2f} ms/step  {name[:130]}")


if __name__ == "__main__":
    main()
