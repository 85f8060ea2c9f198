"""Pallas TPU kernel: fused KNN candidate-distance + K-way selection.

The XLA fast path (ops/query.py `_knn_chunk`, nbr-table branch) materializes
the [C, Q*P] squared-distance block in HBM and then selects K winners with a
two-operand sort / K argmin sweeps / native TopK — on the end-to-end roofline
(PERF.md) that selection is the single largest item (the sort moves ~5.4 GB
at the lego budget; argmin ~0.6 GB). This kernel reads each candidate block
ONCE: a [B, Q*P] tile of candidate coordinates is loaded to VMEM, squared
distances are computed in registers, and K min-extraction sweeps run entirely
in VMEM — HBM traffic is one pass over the gathered candidates plus the tiny
[C, K] winner outputs.

Selection semantics are identical to the XLA modes (ascending d2,
first-occurrence tie-break; invalid -> pid -1 / d2 inf), covering the
reference CUDA query's winner set (query_worldcoords.cu via
query_point_indices_worldcoords.py:398-475) — parity-tested in
tests/test_pallas_knn.py.

Scope: the prebuilt-neighbor-table path with NN > 0 and shell_layered=False
(the bench/production configuration, config.scene_config). Selection has no
gradient (integer winners; d2 is recomputed from gathered payloads
downstream), so no custom VJP is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEAD = 1.0e7   # candidate-x sentinel threshold (grid dead slots hold 1e8)


def _knn_kernel(cand_ref, pid_ref, ctr_ref, ok_ref, pid_out, d2_out,
                *, K: int, QP: int, r2: float):
    x = cand_ref[0]                                  # [B, QPb]
    y = cand_ref[1]
    z = cand_ref[2]
    dx = x - ctr_ref[:, 0:1]
    dy = y - ctr_ref[:, 1:2]
    dz = z - ctr_ref[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz                 # [B, QPb]
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    # lane >= QP masks the block's lane padding (undefined contents)
    ok = (lane < QP) & (ok_ref[:, 0:1] > 0) & (x < DEAD)
    if r2 > 0:
        ok = ok & (d2 <= r2)
    d2 = jnp.where(ok, d2, jnp.inf)
    pid = pid_ref[:]

    tps, tds = [], []
    for _ in range(K):
        m = jnp.min(d2, axis=-1, keepdims=True)      # [B, 1]
        # first-occurrence winner lane (ties + the all-inf row both resolve
        # to the lowest lane, matching argmin/sort/topk)
        idx = jnp.min(jnp.where(d2 == m, lane, QP), axis=-1, keepdims=True)
        sel = lane == idx                            # exactly one lane
        tps.append(jnp.sum(jnp.where(sel, pid, 0), axis=-1))
        tds.append(m[:, 0])
        d2 = jnp.where(sel, jnp.inf, d2)
    pid_out[:] = jnp.stack(tps, axis=-1)             # [B, K]
    d2_out[:] = jnp.stack(tds, axis=-1)


@functools.partial(jax.jit, static_argnames=("K", "r2", "block"))
def pallas_knn_select(cand: jnp.ndarray, pid: jnp.ndarray,
                      centers: jnp.ndarray, ok_center: jnp.ndarray,
                      K: int, r2: float, block: int = 256):
    """Fused distance + K-nearest selection over gathered candidates.

    cand [C, QP, 3] f32 (dead slots >= 1e8); pid [C, QP] int32;
    centers [C, 3] f32; ok_center [C] bool. Static r2 <= 0 disables the
    radius cut. Returns (pid [C, K] int32, -1 invalid; d2 [C, K], inf
    invalid) — same contract as ops/query._knn_chunk.
    """
    C, QP, _ = cand.shape
    B = block
    while C % B:           # knn chunks are power-of-two-ish; tests are odd
        B //= 2
    # planar [3, C, QP]: xyz on the leading (untiled) dim so each coordinate
    # plane is a clean [B, QP] VMEM tile (a trailing 3-lane axis would pad
    # 3 -> 128). XLA fuses this transpose into the producing gather.
    cand_pl = jnp.transpose(cand, (2, 0, 1))
    ok_f = ok_center.astype(jnp.float32)[:, None]    # [C, 1]

    kern = functools.partial(_knn_kernel, K=K, QP=QP, r2=float(r2))
    top_pid, top_d2 = pl.pallas_call(
        kern,
        grid=(C // B,),
        in_specs=[
            pl.BlockSpec((3, B, QP), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, QP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, K), jnp.int32),
            jax.ShapeDtypeStruct((C, K), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(cand_pl, pid, centers, ok_f)
    ok = jnp.isfinite(top_d2)
    return (jnp.where(ok, top_pid, -1).astype(jnp.int32),
            jnp.where(ok, top_d2, jnp.inf))
