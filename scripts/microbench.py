"""Dependency-chained microbenchmarks for the train-step hot ops on the TPU.

Answers, with measurements instead of guesses:
  1. Is the [M,45] payload gather byte-bound or row-overhead-bound?
     (f32 vs bf16 table, split f32-coords + bf16-payload, padded rows,
      sorted indices)
  2. What does the backward scatter-add cost in f32 vs bf16?
  3. sort-(d2,pid) vs top_k(+winner-gather) for the KNN select.
  4. PE chain cost f32-in vs bf16-in.

Each case runs inside one jit with a lax.fori_loop whose carry feeds the
next iteration (tunnel-safe timing per the axon notes — independent
dispatches report garbage). Arrays are passed as args, never closed over.

Usage: python scripts/microbench.py [case ...]   (default: all)
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

R, SR, K = 3600, 80, 8
M = R * SR * K            # 2,304,000 gather rows at the lego budget
N = 65536                 # point-table rows
C = R * SR                # shading points
QP = 243                  # candidates per shading point (27 cells x 9 pts)
ITERS = 20


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3  # ms per iter


def chain_loop(body):
    """Run body ITERS times with a scalar carry, forcing serialization
    on-device. The carry holds ONLY the scalar (arrays enter via the jit
    args and are closed over by the loop body) — carrying the arrays
    through the loop produced bogus near-zero timings on the axon chip."""
    @jax.jit
    def run(*args):
        def step(i, s):
            return body(i, s, *args)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))
    return run


def make_idx(rng, sorted_=False):
    idx = rng.randint(0, N, size=(M,)).astype(np.int32)
    if sorted_:
        idx = np.sort(idx)
    return jnp.asarray(idx)


def gather_case(width, dtype, sorted_=False, split=None):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(N, width).astype(np.float32)).astype(dtype)
    idx = make_idx(rng, sorted_)

    if split is None:
        def body(i, s, table, idx):
            rows = table[(idx + i) % N]          # [M, width]
            return s + jnp.sum(rows.astype(jnp.float32))
        return timed(chain_loop(body), table, idx)
    w1, w2 = split
    t1 = table[:, :w1].astype(jnp.float32)
    t2 = table[:, w1:w1 + w2].astype(jnp.bfloat16)

    def body(i, s, t1, t2, idx):
        j = (idx + i) % N
        r1 = t1[j]
        r2 = t2[j]
        return s + jnp.sum(r1) + jnp.sum(r2.astype(jnp.float32))
    return timed(chain_loop(body), t1, t2, idx)


def scatter_case(width, dtype):
    rng = np.random.RandomState(0)
    grads = jnp.asarray(rng.rand(M, width).astype(np.float32)).astype(dtype)
    idx = make_idx(rng)

    def body(i, s, grads, idx):
        j = (idx + i) % N
        tab = jnp.zeros((N, width), grads.dtype)
        tab = tab.at[j].add(grads)
        return s + jnp.sum(tab.astype(jnp.float32))
    return timed(chain_loop(body), grads, idx)


def sort_vs_topk():
    rng = np.random.RandomState(0)
    d2 = jnp.asarray(rng.rand(C, QP).astype(np.float32))
    pid = jnp.asarray(rng.randint(0, N, size=(C, QP)).astype(np.int32))

    def body_sort(i, s, d2, pid):
        d2i = d2 + i * 1e-9
        ds, ps = jax.lax.sort((d2i, pid), num_keys=1)
        return s + jnp.sum(ds[:, :K]) + jnp.sum(ps[:, :K].astype(jnp.float32))

    def body_topk(i, s, d2, pid):
        d2i = d2 + i * 1e-9
        neg, ti = jax.lax.top_k(-d2i, K)
        win = jnp.take_along_axis(pid, ti, axis=-1)
        return s - jnp.sum(neg) + jnp.sum(win.astype(jnp.float32))

    def body_argmin_iter(i, s, d2, pid):
        # K passes of masked argmin (CUDA-heap analog)
        d2i = d2 + i * 1e-9
        total = jnp.float32(0.0)
        cur = d2i
        for _ in range(K):
            am = jnp.argmin(cur, axis=-1)                    # [C]
            total += jnp.sum(jnp.take_along_axis(
                pid, am[:, None], axis=-1).astype(jnp.float32))
            cur = cur.at[jnp.arange(C), am].set(jnp.inf)
        return s + total

    return (timed(chain_loop(body_sort), d2, pid),
            timed(chain_loop(body_topk), d2, pid),
            timed(chain_loop(body_argmin_iter), d2, pid))


def pe_case(dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(M, 35).astype(np.float32)).astype(dtype)
    fb = 2.0 ** jnp.arange(3, dtype=jnp.float32)

    def body(i, s, x, fb):
        xi = x + jnp.asarray(i, x.dtype)
        base = (xi[..., None] * fb.astype(xi.dtype)).reshape(M, 35 * 3)
        inter = jnp.stack([jnp.sin(base), jnp.cos(base)], axis=-1)
        pe = inter.reshape(M, 35 * 6)
        out = jnp.concatenate([xi, pe], axis=-1)
        return s + jnp.sum(out.astype(jnp.float32))
    return timed(chain_loop(body), x, fb)


def main():
    want = set(sys.argv[1:]) or {"gather", "scatter", "knn", "pe"}
    res = {}
    if "gather" in want:
        res["gather_f32_45"] = gather_case(45, jnp.float32)
        res["gather_bf16_45"] = gather_case(45, jnp.bfloat16)
        res["gather_f32_45_sorted"] = gather_case(45, jnp.float32, sorted_=True)
        res["gather_split_6f32_39bf16"] = gather_case(45, jnp.float32,
                                                      split=(6, 39))
        res["gather_f32_64"] = gather_case(64, jnp.float32)
        res["gather_bf16_128"] = gather_case(128, jnp.bfloat16)
        res["gather_bf16_256"] = gather_case(256, jnp.bfloat16)
    if "scatter" in want:
        res["scatter_f32_45"] = scatter_case(45, jnp.float32)
        res["scatter_bf16_45"] = scatter_case(45, jnp.bfloat16)
        res["scatter_f32_32"] = scatter_case(32, jnp.float32)
    if "knn" in want:
        s, t, a = sort_vs_topk()
        res["knn_sort_pair"] = s
        res["knn_topk_gather"] = t
        res["knn_argmin_x8"] = a
    if "pe" in want:
        res["pe_f32_in"] = pe_case(jnp.float32)
        res["pe_bf16_in"] = pe_case(jnp.bfloat16)
    for k, v in res.items():
        print(f"{k:28s} {v:8.2f} ms")
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
