"""Microbenchmarks for the train-step hot ops on the TPU.

Answers, with measurements instead of guesses:
  1. Is the [M,45] payload gather byte-bound or row-overhead-bound?
     (f32 vs bf16 table, split f32-coords + bf16-payload, padded rows,
      sorted indices)
  2. What does the backward scatter-add cost in f32 vs bf16?
  3. sort-(d2,pid) vs top_k(+winner-gather) for the KNN select.
  4. PE chain cost f32-in vs bf16-in (output materialized, like the step).

Timing pattern: python-level loop of jitted calls threading a DONATED carry
(the bench.py pattern) — the only dispatch style that measures truthfully
over the axon tunnel. Device-side fori_loop chains and independent
dispatches both report garbage there.

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


def timed(step, carry, *args):
    """step: jitted fn (carry, *args) -> carry, donating carry."""
    for _ in range(3):
        carry = step(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = step(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms per iter


def make_idx(rng, sorted_=False):
    idx = rng.randint(0, N, size=(M,)).astype(np.int32)
    if sorted_:
        idx = np.sort(idx)
    return jnp.asarray(idx)


def carry0():
    return (jnp.float32(0.0), jnp.int32(0))


def gather_case(width, dtype, sorted_=False, split=None, materialize=True):
    """materialize=True forces the gathered rows to HBM (like the real step,
    whose gather output feeds several consumers) by summing along axis 0
    only after an independent elementwise touch."""
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(N, width).astype(np.float32)).astype(dtype)
    idx = make_idx(rng, sorted_)

    if split is None:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(carry, table, idx):
            s, i = carry
            rows = table[(idx + i) % N]
            return (s + jnp.sum(rows.astype(jnp.float32)), i + 1)
        return timed(step, carry0(), table, idx)

    w1, w2 = split
    t1 = table[:, :w1].astype(jnp.float32)
    t2 = table[:, w1:w1 + w2].astype(jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(carry, t1, t2, idx):
        s, i = carry
        j = (idx + i) % N
        return (s + jnp.sum(t1[j]) + jnp.sum(t2[j].astype(jnp.float32)),
                i + 1)
    return timed(step, carry0(), t1, t2, idx)


def scatter_case(width, dtype):
    rng = np.random.RandomState(0)
    grads = jnp.asarray(rng.rand(M, width).astype(np.float32)).astype(dtype)
    idx = make_idx(rng)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(carry, grads, idx):
        s, i = carry
        j = (idx + i) % N
        tab = jnp.zeros((N, width), grads.dtype).at[j].add(grads)
        return (s + jnp.sum(tab.astype(jnp.float32)), i + 1)
    return timed(step, carry0(), grads, idx)


def knn_cases():
    rng = np.random.RandomState(0)
    d2 = jnp.asarray(rng.rand(C, QP).astype(np.float32))
    pid = jnp.asarray(rng.randint(0, N, size=(C, QP)).astype(np.int32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_sort(carry, d2, pid):
        s, i = carry
        ds, ps = jax.lax.sort((d2 + i * 1e-9, pid), num_keys=1)
        return (s + jnp.sum(ds[:, :K])
                + jnp.sum(ps[:, :K].astype(jnp.float32)), i + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_topk(carry, d2, pid):
        s, i = carry
        neg, ti = jax.lax.top_k(-(d2 + i * 1e-9), K)
        win = jnp.take_along_axis(pid, ti, axis=-1)
        return (s - jnp.sum(neg) + jnp.sum(win.astype(jnp.float32)), i + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_argmin(carry, d2, pid):
        s, i = carry
        cur = d2 + i * 1e-9
        tot = jnp.float32(0.0)
        for _ in range(K):
            am = jnp.argmin(cur, axis=-1)
            tot += jnp.sum(jnp.take_along_axis(
                pid, am[:, None], axis=-1).astype(jnp.float32))
            cur = cur.at[jnp.arange(C), am].set(jnp.inf)
        return (s + tot, i + 1)

    return (timed(step_sort, carry0(), d2, pid),
            timed(step_topk, carry0(), d2, pid),
            timed(step_argmin, carry0(), d2, pid))


def pe_case(dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(M, 35).astype(np.float32)).astype(dtype)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(carry, x):
        s, i = carry
        xi = x + jnp.asarray(i, x.dtype)
        fb = (2.0 ** jnp.arange(3, dtype=jnp.float32)).astype(x.dtype)
        base = (xi[..., None] * fb).reshape(M, 35 * 3)
        inter = jnp.stack([jnp.sin(base), jnp.cos(base)], axis=-1)
        out = jnp.concatenate([xi, inter.reshape(M, 35 * 6)], axis=-1)
        return (s + jnp.sum(out.astype(jnp.float32)), i + 1)
    return timed(step, carry0(), x)


def main():
    want = set(sys.argv[1:]) or {"gather", "scatter", "knn", "pe"}
    res = {}
    if "gather" in want:
        res["gather_f32_45"] = gather_case(45, jnp.float32)
        res["gather_bf16_45"] = gather_case(45, jnp.bfloat16)
        res["gather_f32_45_sorted"] = gather_case(45, jnp.float32,
                                                  sorted_=True)
        res["gather_split_6f32_39bf16"] = gather_case(45, jnp.float32,
                                                      split=(6, 39))
        res["gather_f32_64"] = gather_case(64, jnp.float32)
        res["gather_bf16_128"] = gather_case(128, jnp.bfloat16)
    if "scatter" in want:
        res["scatter_f32_45"] = scatter_case(45, jnp.float32)
        res["scatter_bf16_45"] = scatter_case(45, jnp.bfloat16)
        res["scatter_f32_32"] = scatter_case(32, jnp.float32)
    if "knn" in want:
        s, t, a = knn_cases()
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
