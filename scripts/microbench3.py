"""Device-trace probe of the round-4 step-structure levers (VERDICT r4).

The round-3 A/B sweep proved the step is NOT at its byte roofline: the
measured cost model on this chip is ~8-13 ns per random-access ROW
(gather or scatter) regardless of row width, while lax.sort moves ~1.4M
i32 elements per 1.5 ms. This probe prices the three structural rewrites
that follow from that model, on REAL bench-scene data:

  chain_base    — today's occupancy chain: [R,D] s8 occupancy gather
                  (11 ms in the step trace) + [R,D] select sort +
                  [R,SR] t take_along_axis
  chain_merge   — sort-merge membership: concat(occupied vids, sample
                  vids) -> one 2-op sort + cummax + one 1-op sort; zero
                  table gathers (the selection keys come out in per-ray
                  blocks because each ray owns exactly D disjoint keys)
  pe_exact      — positional_encoding as shipped (6 transcendentals per
                  element at freqs=3)
  pe_ladder     — sin/cos at the base frequency + double-angle recurrence
                  (2 transcendentals + 4 mul/adds per octave)
  expand_sep    — today's five expand_compact scatter-sets back to [R*SR]
  expand_packed — ONE packed [C, 22] scatter-set, split after

Each variant asserts exact (or tolerance) agreement with its baseline on
the real data before timing. Usage: python scripts/microbench3.py
"""
import functools
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _batch, _scene_state  # noqa: E402
from pointnerf_tpu.config import bench_config  # noqa: E402
from pointnerf_tpu.ops.grid import grid_meta, voxel_coords, flat_vid  # noqa: E402
from pointnerf_tpu.ops.query import RAY_GENERATORS  # noqa: E402
from pointnerf_tpu.ops.pe import positional_encoding  # noqa: E402

REPS = 5
R, D, SR = 3600, 400, 80
C = 36352


def run_traced(name, step, carry, *args):
    for _ in range(2):
        carry = step(carry, *args)
    jax.block_until_ready(carry)
    logdir = f"/tmp/mb3/{name}"
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
                  if not nm.startswith("jit_") and not nm.isdigit()),
                 key=lambda kv: -kv[1])[:4]
    print(f"{name:16s} step={step_ms:7.2f} ms | " + " | ".join(
        f"{nm.split('/')[-1][:22]}={d/1e3/REPS:.2f}" for nm, d in top))
    return step_ms


def main():
    cfg = bench_config()
    q = cfg.query
    pc, st, params, grid = _scene_state(cfg, n_pts=65536)
    batch = _batch(cfg, n_rays=R)
    meta = grid_meta(q)
    G = meta.num_cells

    gen = RAY_GENERATORS["near_far_linear"]
    raypos, _seg, tvals = gen(batch.campos, batch.raydir, D,
                              float(cfg.render.near_plane),
                              float(cfg.render.far_plane))
    tvals = jnp.broadcast_to(tvals, (R, D))
    coor = voxel_coords(raypos, meta)
    vid, inb = flat_vid(coor, meta)                        # [R, D]
    vid = np.asarray(vid)
    inb = np.asarray(inb)
    occ_np = np.asarray(grid.vox_occ)
    occ_vids_np = np.nonzero(occ_np > 0)[0].astype(np.int32)
    n_dil = occ_vids_np.size
    max_d = q.max_d
    assert n_dil <= max_d, (n_dil, max_d)
    occ_vids_np = np.concatenate(
        [occ_vids_np, np.full(max_d - n_dil, G, np.int32)])
    print(f"G={G} dilated-occupied={n_dil} (max_d={max_d}) "
          f"hit-rate={(occ_np[np.minimum(vid, G-1)] > 0)[inb].mean():.3f}")

    vid_j = jnp.asarray(vid)
    inb_j = jnp.asarray(inb)
    occ_j = jnp.asarray(occ_np)
    occv_j = jnp.asarray(occ_vids_np)
    tv_j = jnp.asarray(tvals)

    d_ar = jnp.arange(D, dtype=jnp.int32)[None, :]

    # ---- baseline chain (select_shading_points select="sort") ----
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain_base(carry, vid, inb, occ, tv):
        s, i = carry
        v = jnp.minimum(vid + (i & 0), G - 1)
        occg = occ[v]
        hit = inb & (occg > 0)
        key = jnp.where(hit, d_ar, D + d_ar)
        idx = jax.lax.sort(key, dimension=-1)[:, :SR]
        mask = idx < D
        idx = jnp.minimum(idx, D - 1)
        t = jnp.take_along_axis(tv, idx, axis=1)
        t = jnp.where(mask, t, 0.0)
        return (s + jnp.sum(t) + jnp.sum(jnp.where(mask, idx, 0)), i + 1)

    # ---- sort-merge chain ----
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain_merge(carry, vid, inb, occv, tv):
        s, i = carry
        v = vid + (i & 0)
        # OOB samples get key 2G+2: matches nothing, sorts last among mkeys
        mkey_q = jnp.where(inb, v * 2 + 1, 2 * G + 2).reshape(-1)
        mkey_s = occv * 2                                   # pad G -> 2G
        keys = jnp.concatenate([mkey_s, mkey_q])
        lanes = jnp.concatenate(
            [R * D + jnp.arange(max_d, dtype=jnp.int32),
             jnp.arange(R * D, dtype=jnp.int32)])
        ks, ls = jax.lax.sort((keys, lanes), num_keys=1)
        is_s = (ks & 1) == 0
        run = jax.lax.cummax(jnp.where(is_s, ks, -1))
        hit = (~is_s) & (run == ks - 1)
        r = ls // D
        d = ls % D
        key2 = r * (2 * D) + jnp.where(hit, d, D + d)
        k2 = jax.lax.sort(key2)
        blk = k2[: R * D].reshape(R, D)[:, :SR]
        dsel = blk - (jnp.arange(R, dtype=jnp.int32) * 2 * D)[:, None]
        mask = dsel < D
        idx = jnp.minimum(jnp.where(mask, dsel, dsel - D), D - 1)
        t = jnp.take_along_axis(tv, idx, axis=1)
        t = jnp.where(mask, t, 0.0)
        return (s + jnp.sum(t) + jnp.sum(jnp.where(mask, idx, 0)), i + 1)

    # correctness: identical selected slots + masks
    a = jax.jit(lambda: chain_base((jnp.float32(0), jnp.int32(0)),
                                   vid_j, inb_j, occ_j, tv_j))()
    b = jax.jit(lambda: chain_merge((jnp.float32(0), jnp.int32(0)),
                                    vid_j, inb_j, occv_j, tv_j))()
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)
    print("merge == base on real data: OK")

    res = {}
    res["chain_base"] = run_traced(
        "chain_base", chain_base, (jnp.float32(0), jnp.int32(0)),
        vid_j, inb_j, occ_j, tv_j)
    res["chain_merge"] = run_traced(
        "chain_merge", chain_merge, (jnp.float32(0), jnp.int32(0)),
        vid_j, inb_j, occv_j, tv_j)

    # ---- PE variants over the real decode width ----
    rng = np.random.RandomState(0)
    M = C * 8
    feat = jnp.asarray(rng.rand(M, 32).astype(np.float32)) * 4 - 2
    FREQS = 3

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pe_exact(carry, x):
        s, i = carry
        y = positional_encoding(x + (i & 0).astype(x.dtype), FREQS)
        return (s + jnp.sum(y), i + 1)

    def pe_ladder_fn(x, freqs):
        s0, c0 = jnp.sin(x), jnp.cos(x)
        sins, coss = [s0], [c0]
        for _ in range(freqs - 1):
            s_, c_ = sins[-1], coss[-1]
            sins.append(2.0 * s_ * c_)
            coss.append(1.0 - 2.0 * s_ * s_)
        # interleaved (sin f, cos f) pairs ordered by freq then input dim:
        # match positional_encoding's layout [x0f0 x1f0 ... sin/cos pairs]
        st = jnp.stack([jnp.stack(sins, -1), jnp.stack(coss, -1)], -1)
        return st.reshape(x.shape[:-1] + (x.shape[-1] * freqs * 2,))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pe_ladder(carry, x):
        s, i = carry
        y = pe_ladder_fn(x + (i & 0).astype(x.dtype), FREQS)
        return (s + jnp.sum(y), i + 1)

    ye = jax.jit(lambda x: positional_encoding(x, FREQS))(feat[:1024])
    yl = jax.jit(lambda x: pe_ladder_fn(x, FREQS))(feat[:1024])
    err = float(jnp.max(jnp.abs(ye - yl)))
    print(f"pe ladder vs exact max abs err: {err:.2e}")

    res["pe_exact"] = run_traced("pe_exact", pe_exact,
                                 (jnp.float32(0), jnp.int32(0)), feat)
    res["pe_ladder"] = run_traced("pe_ladder", pe_ladder,
                                  (jnp.float32(0), jnp.int32(0)), feat)

    # ---- expand_compact packing ----
    RS = R * SR
    keep = jnp.asarray(rng.permutation(RS)[:C].astype(np.int32))
    feats = jnp.asarray(rng.rand(C, 4).astype(np.float32))
    wgt = jnp.asarray(rng.rand(C, 8).astype(np.float32))
    confc = jnp.asarray(rng.rand(C, 8).astype(np.float32))
    rv = jnp.asarray((rng.rand(C) > 0.1))

    def expand1(a, keep, fill):
        base = jnp.broadcast_to(jnp.asarray(fill, a.dtype),
                                (RS,) + a.shape[1:])
        return base.at[keep].set(a, mode="drop", unique_indices=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def expand_sep(carry, keep, feats, wgt, confc, rv):
        s, i = carry
        k = keep + (i & 0)
        f = expand1(feats, k, 0.0)
        w = expand1(wgt, k, 0.0)
        cc = expand1(confc, k, 0.123)
        v = expand1(rv.astype(jnp.float32), k, 0.0)
        m = expand1(rv.astype(jnp.float32), k, 0.0)
        return (s + jnp.sum(f) + jnp.sum(w) + jnp.sum(cc) + jnp.sum(v)
                + jnp.sum(m), i + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def expand_packed(carry, keep, feats, wgt, confc, rv):
        s, i = carry
        k = keep + (i & 0)
        packed = jnp.concatenate(
            [feats, wgt, confc, rv.astype(jnp.float32)[:, None],
             rv.astype(jnp.float32)[:, None]], axis=-1)      # [C, 22]
        fills = jnp.concatenate(
            [jnp.zeros(12), jnp.full((8,), 0.123), jnp.zeros(2)]
        ).astype(jnp.float32)
        base = jnp.broadcast_to(fills, (RS, 22))
        full = base.at[k].set(packed, mode="drop", unique_indices=True)
        f, w, cc, v, m = (full[:, :4], full[:, 4:12], full[:, 12:20],
                          full[:, 20], full[:, 21])
        return (s + jnp.sum(f) + jnp.sum(w) + jnp.sum(cc) + jnp.sum(v)
                + jnp.sum(m), i + 1)

    res["expand_sep"] = run_traced(
        "expand_sep", expand_sep, (jnp.float32(0), jnp.int32(0)),
        keep, feats, wgt, confc, rv)
    res["expand_packed"] = run_traced(
        "expand_packed", expand_packed, (jnp.float32(0), jnp.int32(0)),
        keep, feats, wgt, confc, rv)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
