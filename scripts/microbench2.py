"""Device-trace comparison of backward-scatter and KNN-select variants.

Wall-clock over the axon tunnel lies even for chained donated calls; the
device trace is the only truthful measurement (see PERF.md). Each variant
runs 5x inside one traced region; we report per-iter device time of the
dominant ops per jit step.

Variants:
  scatter_f32      — baseline .at[idx].add(g) f32 (the current backward)
  scatter_bf16     — same in bf16
  scatter_sorted   — sort idx, permute rows by gather, scatter-add with
                     indices_are_sorted=True
  segsum_sorted    — sort idx, permute rows, jax.ops.segment_sum(sorted)
  knn_sort         — two-operand lax.sort of (d2, pid) [C, 243] (current)
  knn_topk         — lax.top_k + winner pid take_along_axis
  knn_approx       — lax.approx_min_k (TPU-native partial reduction)

Usage: python scripts/microbench2.py
"""
import functools
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N, M = 65536, 2_304_000
C, QP, K = 288_000, 243, 8
REPS = 5


def run_traced(name, step, carry, *args):
    for _ in range(2):
        carry = step(carry, *args)
    jax.block_until_ready(carry)
    logdir = f"/tmp/mb2/{name}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(REPS):
        carry = step(carry, *args)
    jax.block_until_ready(carry)
    jax.profiler.stop_trace()

    tr = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(tr, "rt") as f:
        ev = json.load(f)["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pid_names.items()
           if "TPU" in n or "/device" in n.lower()}
    ops = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            ops[e.get("name", "")] += e.get("dur", 0.0)
    step_ms = max((d for nm, d in ops.items() if nm.startswith("jit_")),
                  default=0.0) / 1e3 / REPS
    top = sorted(((nm, d) for nm, d in ops.items()
                  if not nm.startswith("jit_")), key=lambda kv: -kv[1])[:4]
    print(f"{name:16s} step={step_ms:7.2f} ms | " + " | ".join(
        f"{nm.split('/')[-1][:24]}={d/1e3/REPS:.2f}" for nm, d in top))
    return step_ms


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, size=(M,)).astype(np.int32))
    g32 = jnp.asarray(rng.rand(M, 45).astype(np.float32))
    g16 = g32.astype(jnp.bfloat16)
    res = {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def s_f32(carry, g, idx):
        s, i = carry
        tab = jnp.zeros((N, 45), jnp.float32).at[(idx + i) % N].add(g)
        return (s + jnp.sum(tab), i + 1)
    res["scatter_f32"] = run_traced("scatter_f32", s_f32,
                                    (jnp.float32(0), jnp.int32(0)), g32, idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def s_bf16(carry, g, idx):
        s, i = carry
        tab = jnp.zeros((N, 45), jnp.bfloat16).at[(idx + i) % N].add(g)
        return (s + jnp.sum(tab.astype(jnp.float32)), i + 1)
    res["scatter_bf16"] = run_traced("scatter_bf16", s_bf16,
                                     (jnp.float32(0), jnp.int32(0)), g16, idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def s_sorted(carry, g, idx):
        s, i = carry
        j = (idx + i) % N
        js, perm = jax.lax.sort((j, jnp.arange(M, dtype=jnp.int32)),
                                num_keys=1)
        rows = g[perm]
        tab = jnp.zeros((N, 45), jnp.float32).at[js].add(
            rows, indices_are_sorted=True)
        return (s + jnp.sum(tab), i + 1)
    res["scatter_sorted"] = run_traced("scatter_sorted", s_sorted,
                                       (jnp.float32(0), jnp.int32(0)),
                                       g32, idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def s_segsum(carry, g, idx):
        s, i = carry
        j = (idx + i) % N
        js, perm = jax.lax.sort((j, jnp.arange(M, dtype=jnp.int32)),
                                num_keys=1)
        rows = g[perm]
        tab = jax.ops.segment_sum(rows, js, num_segments=N,
                                  indices_are_sorted=True)
        return (s + jnp.sum(tab), i + 1)
    res["segsum_sorted"] = run_traced("segsum_sorted", s_segsum,
                                      (jnp.float32(0), jnp.int32(0)),
                                      g32, idx)

    d2 = jnp.asarray(rng.rand(C, QP).astype(np.float32))
    pid = jnp.asarray(rng.randint(0, N, size=(C, QP)).astype(np.int32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k_sort(carry, d2, pid):
        s, i = carry
        ds, ps = jax.lax.sort((d2 + i * 1e-9, pid), num_keys=1)
        return (s + jnp.sum(ds[:, :K])
                + jnp.sum(ps[:, :K].astype(jnp.float32)), i + 1)
    res["knn_sort"] = run_traced("knn_sort", k_sort,
                                 (jnp.float32(0), jnp.int32(0)), d2, pid)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k_topk(carry, d2, pid):
        s, i = carry
        neg, ti = jax.lax.top_k(-(d2 + i * 1e-9), K)
        win = jnp.take_along_axis(pid, ti, axis=-1)
        return (s - jnp.sum(neg) + jnp.sum(win.astype(jnp.float32)), i + 1)
    res["knn_topk"] = run_traced("knn_topk", k_topk,
                                 (jnp.float32(0), jnp.int32(0)), d2, pid)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k_approx(carry, d2, pid):
        s, i = carry
        vals, ti = jax.lax.approx_min_k(d2 + i * 1e-9, K,
                                        recall_target=0.95)
        win = jnp.take_along_axis(pid, ti, axis=-1)
        return (s + jnp.sum(vals) + jnp.sum(win.astype(jnp.float32)), i + 1)
    res["knn_approx"] = run_traced("knn_approx", k_approx,
                                   (jnp.float32(0), jnp.int32(0)), d2, pid)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
