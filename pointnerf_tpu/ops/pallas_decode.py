"""Fused Pallas decode: PE -> shading MLP -> per-point alpha -> weighted
K-reduction, entirely in VMEM.

Why: at the lego budget the aggregator decode pushes R*SR*K = 2.3M rows
through ~0.27M MACs/row (block1 + block3 + alpha,
point_aggregators.py:488-646). The XLA path materializes every [2.3M, 256]
activation in HBM — ~6 tensors forward and 2-3x that backward, ~40 GB of
traffic per step against ~4 TFLOP of math: memory-bound at <10% MXU
(round-1 trace: 190 ms of a 254 ms step). This kernel streams one packed
[T, 128] input tile per grid step, runs the whole per-point MLP chain in
VMEM, multiplies by the (weight*conf) coefficient, and reduces over the K
neighbors before anything returns to HBM — per-step traffic drops to the
packed input (0.6 GB) + per-sample outputs (~0.4 GB) + per-row input grads
(1.2 GB backward).

Backward is a second Pallas kernel (custom_vjp): it recomputes the forward
activations per tile (flash-attention-style rematerialization — HBM reads
beat HBM round-trips) and accumulates dW/db across the sequential TPU grid
into constant-index output blocks.

Supported decode envelope (the canonical lego config, falls back to the XLA
path otherwise — see models/aggregator.py): agg_intrp_order=2, LeakyReLU,
act_super=1, no block2, no *_xyz_mode hooks, single-linear alpha branch.
The per-sample color branch (288k rows, ~2% of the FLOPs) stays in XLA.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class DecodeSpec(NamedTuple):
    """Static shape/config info for the fused decode (hashable)."""
    Fi: int          # feature channels (post kernel-strip)
    Dd: int          # dists channels (cfg.dist_dim)
    E: int           # extra block3 channels (color 3 + dir 4, mode-dependent)
    Ff: int          # num_feat_freqs
    Fd: int          # |dist_xyz_freq|
    H: int           # shading_feature_num
    K: int           # neighbors per shading point
    L1: int          # block1 layers
    L3: int          # block3 layers
    neg_slope: float
    bf16: bool       # run matmuls in bf16 (f32 accumulate)
    interpret: bool  # pallas interpret mode (CPU tests)
    # Rows per grid step. The sequential grid's per-step overhead dominated
    # the first measurement (1024/512 -> 2250 fwd + 4500 bwd steps); larger
    # tiles amortize it while the working set stays inside VMEM.
    tile_rows: int = 2048
    tile_rows_bwd: int = 1024

    @property
    def x1(self) -> int:
        pe = 2 * self.Ff * self.Fi
        de = 2 * self.Fd * self.Dd if self.Fd > 0 else self.Dd
        return self.Fi + pe + de

    @property
    def x1p(self) -> int:
        return _rup(self.x1, 128)

    @property
    def x3p(self) -> int:
        return _rup(self.H + self.E, 128)

    @property
    def craw(self) -> int:
        return _rup(self.Fi + self.Dd + self.E + 1, 128)

    @property
    def tile(self) -> int:
        return _rup(self.tile_rows, self.K * 8)

    @property
    def tile_bwd(self) -> int:
        return _rup(self.tile_rows_bwd, self.K * 8)


def pe_permutation(spec: DecodeSpec) -> np.ndarray:
    """Row permutation mapping the kernel's f-major PE layout onto the XLA
    layout of aggregate()'s x (ops/pe.py: interleaved (sin,cos) per
    (channel, freq) pair, channel-major).

    kernel x layout: [feat | sin(f0)all_d .. sin(fF-1) | cos(f0) .. |
                      sinD(f0)all_c .. | cosD(f0) ..]
    (f-major blocks so forward/backward PE touch only static lane slices —
    no lane reshapes, which Mosaic restricts)."""
    Fi, Dd, Ff, Fd = spec.Fi, spec.Dd, spec.Ff, spec.Fd
    perm = []
    perm += list(range(Fi))                                  # raw feat
    for f in range(Ff):                                      # sinF f-major
        perm += [Fi + (d * Ff + f) * 2 for d in range(Fi)]
    for f in range(Ff):                                      # cosF
        perm += [Fi + (d * Ff + f) * 2 + 1 for d in range(Fi)]
    off = Fi + 2 * Ff * Fi
    if Fd > 0:
        for f in range(Fd):                                  # sinD
            perm += [off + (c * Fd + f) * 2 for c in range(Dd)]
        for f in range(Fd):                                  # cosD
            perm += [off + (c * Fd + f) * 2 + 1 for c in range(Dd)]
    else:
        perm += [off + c for c in range(Dd)]
    assert len(perm) == spec.x1
    return np.asarray(perm, np.int32)


def _build_x(raw, spec: DecodeSpec):
    """Packed raw tile [T, CRAW] -> PE-expanded x [T, X1P] (f32)."""
    T = raw.shape[0]
    Fi, Dd = spec.Fi, spec.Dd
    feat = raw[:, :Fi]
    dists = raw[:, Fi:Fi + Dd]
    parts = [feat]
    sins, coss = [], []
    for f in range(spec.Ff):
        b = feat * (2.0 ** f)
        sins.append(jnp.sin(b))
        coss.append(jnp.cos(b))
    parts += sins + coss
    if spec.Fd > 0:
        sind, cosd = [], []
        for f in range(spec.Fd):
            b = dists * (2.0 ** f)
            sind.append(jnp.sin(b))
            cosd.append(jnp.cos(b))
        parts += sind + cosd
    else:
        parts.append(dists)
    x = jnp.concatenate(parts, axis=-1)
    pad = spec.x1p - spec.x1
    if pad:
        x = jnp.concatenate([x, jnp.zeros((T, pad), x.dtype)], axis=-1)
    return x


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a [T, N] @ b[N-rows]^T given b [M, N]: contract last/last -> [T, M]."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_acc(x, g):
    """x [T, N], g [T, M] -> x^T g [N, M] (contract over rows)."""
    return jax.lax.dot_general(x, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _leaky(x, slope):
    return jnp.where(x > 0, x, x * slope)


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _forward_tile(raw, weights, spec: DecodeSpec):
    """Shared fwd recompute: returns (zs, hs, x, x3, za, alpha_pp, w_row).

    zs/hs are per-layer pre/post-activation lists (None-padded split between
    block1 and block3)."""
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    Fi, Dd, E = spec.Fi, spec.Dd, spec.E
    T = raw.shape[0]
    x = _build_x(raw, spec).astype(cdt)                       # [T, X1P]
    extras = raw[:, Fi + Dd:Fi + Dd + E].astype(cdt)
    w_row = raw[:, Fi + Dd + E:Fi + Dd + E + 1].astype(jnp.float32)

    (W1s, b1s, W3s, b3s, wa, ba) = weights
    zs, hs = [], []
    h = x
    for i in range(spec.L1):
        z = _mm(h, W1s[i]) + b1s[i]
        zs.append(z)
        h = _leaky(z, spec.neg_slope).astype(cdt)
        hs.append(h)
    pad3 = spec.x3p - spec.H - E
    x3 = jnp.concatenate(
        [h, extras] + ([jnp.zeros((T, pad3), cdt)] if pad3 else []), axis=-1)
    h = x3
    for i in range(spec.L3):
        z = _mm(h, W3s[i]) + b3s[i]
        zs.append(z)
        h = _leaky(z, spec.neg_slope).astype(cdt)
        hs.append(h)
    za = jnp.sum(h.astype(jnp.float32) * wa, axis=-1, keepdims=True) + ba
    alpha_pp = _softplus(za - 1.0)                            # [T, 1]
    return x, x3, zs, hs, za, alpha_pp, w_row


def _fwd_kernel(raw_ref, *refs, spec: DecodeSpec):
    n_w = 2 * (spec.L1 + spec.L3) + 2
    w_refs = refs[:n_w]
    fagg_ref, aagg_ref = refs[n_w:]
    weights = _unpack_weights(w_refs, spec)
    raw = raw_ref[:].astype(jnp.float32)
    _x, _x3, _zs, hs, _za, alpha_pp, w_row = _forward_tile(raw, weights, spec)
    T = raw.shape[0]
    G = T // spec.K
    hw = hs[-1].astype(jnp.float32) * w_row                   # [T, H]
    fagg_ref[:] = jnp.sum(hw.reshape(G, spec.K, spec.H), axis=1)
    aw = (alpha_pp * w_row).reshape(G, spec.K)
    asum = jnp.sum(aw, axis=1, keepdims=True)                 # [G, 1]
    aagg_ref[:] = jnp.concatenate(
        [asum, jnp.zeros((G, 127), jnp.float32)], axis=-1)


def _unpack_weights(w_refs, spec: DecodeSpec):
    i = 0
    W1s, b1s, W3s, b3s = [], [], [], []
    for _ in range(spec.L1):
        W1s.append(w_refs[i][:]); b1s.append(w_refs[i + 1][:])
        i += 2
    for _ in range(spec.L3):
        W3s.append(w_refs[i][:]); b3s.append(w_refs[i + 1][:])
        i += 2
    wa = w_refs[i][:]; ba = w_refs[i + 1][0, 0]
    return (W1s, b1s, W3s, b3s, wa, ba)


def _bwd_kernel(raw_ref, *refs, spec: DecodeSpec):
    n_w = 2 * (spec.L1 + spec.L3) + 2
    w_refs = refs[:n_w]
    gf_ref, ga_ref = refs[n_w:n_w + 2]
    out_refs = refs[n_w + 2:]
    graw_ref = out_refs[0]
    dw_refs = out_refs[1:]
    weights = _unpack_weights(w_refs, spec)
    (W1s, b1s, W3s, b3s, wa, ba) = weights
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    Fi, Dd, E, H, K = spec.Fi, spec.Dd, spec.E, spec.H, spec.K

    raw = raw_ref[:].astype(jnp.float32)
    x, x3, zs, hs, za, alpha_pp, w_row = _forward_tile(raw, weights, spec)
    T = raw.shape[0]
    G = T // K

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[:] = jnp.zeros_like(r)

    # upstream grads broadcast back over K
    g_f = jnp.broadcast_to(gf_ref[:][:, None, :], (G, K, H)
                           ).reshape(T, H)                    # [T, H]
    g_a = jnp.broadcast_to(ga_ref[:][:, :1][:, None, :], (G, K, 1)
                           ).reshape(T, 1)                    # [T, 1]

    h_last = hs[-1].astype(jnp.float32)
    # d/dw_row: fagg and alpha contributions
    g_w = (jnp.sum(h_last * g_f, axis=-1, keepdims=True)
           + alpha_pp * g_a)                                  # [T, 1]
    sig = jax.nn.sigmoid(za - 1.0)                            # softplus'
    g_za = g_a * w_row * sig                                  # [T, 1]
    # dwa = sum_T h_last^T * g_za ; dba = sum g_za
    dwa_i = jnp.sum(h_last * g_za, axis=0, keepdims=True)     # [1, H]
    dba_i = jnp.sum(g_za)
    g_h = g_f * w_row + g_za * wa                             # [T, H]

    n_dw = 0  # index into dw_refs: [graw excluded] order W1s,b1s,W3s,b3s,wa,ba
    # walk blocks in reverse: block3 then block1
    acts3 = [x3] + hs[spec.L1:spec.L1 + spec.L3 - 1]
    zs3 = zs[spec.L1:]
    for i in reversed(range(spec.L3)):
        g_z = g_h * jnp.where(zs3[i] > 0, 1.0, spec.neg_slope)
        dW = _mm_acc(acts3[i].astype(cdt), g_z.astype(cdt))
        _accum(dw_refs[2 * (spec.L1 + i)], dW)
        _accum(dw_refs[2 * (spec.L1 + i) + 1],
               jnp.sum(g_z, axis=0, keepdims=True))
        g_h = _mm_t(g_z.astype(cdt), W3s[i])                  # [T, in]
    g_x3 = g_h                                                # [T, X3P]
    g_h = g_x3[:, :H]
    g_extras = g_x3[:, H:H + E]

    acts1 = [x] + hs[:spec.L1 - 1]
    for i in reversed(range(spec.L1)):
        g_z = g_h * jnp.where(zs[i] > 0, 1.0, spec.neg_slope)
        dW = _mm_acc(acts1[i].astype(cdt), g_z.astype(cdt))
        _accum(dw_refs[2 * i], dW)
        _accum(dw_refs[2 * i + 1], jnp.sum(g_z, axis=0, keepdims=True))
        g_h = _mm_t(g_z.astype(cdt), W1s[i])
    g_x = g_h                                                 # [T, X1P]

    _accum(dw_refs[2 * (spec.L1 + spec.L3)], dwa_i)
    _accum(dw_refs[2 * (spec.L1 + spec.L3) + 1],
           jnp.concatenate([jnp.full((1, 1), dba_i), jnp.zeros((1, 127))],
                           axis=-1))

    # PE backward -> packed raw grads
    feat = raw[:, :Fi]
    dists = raw[:, Fi:Fi + Dd]
    g_feat = g_x[:, :Fi]
    off = Fi
    for f in range(spec.Ff):
        b = feat * (2.0 ** f)
        g_sin = g_x[:, off + f * Fi: off + (f + 1) * Fi]
        g_cos = g_x[:, off + (spec.Ff + f) * Fi: off + (spec.Ff + f + 1) * Fi]
        g_feat = g_feat + (2.0 ** f) * (g_sin * jnp.cos(b)
                                        - g_cos * jnp.sin(b))
    off = Fi + 2 * spec.Ff * Fi
    if spec.Fd > 0:
        g_dists = jnp.zeros((T, Dd), jnp.float32)
        for f in range(spec.Fd):
            b = dists * (2.0 ** f)
            g_sin = g_x[:, off + f * Dd: off + (f + 1) * Dd]
            g_cos = g_x[:, off + (spec.Fd + f) * Dd:
                        off + (spec.Fd + f + 1) * Dd]
            g_dists = g_dists + (2.0 ** f) * (g_sin * jnp.cos(b)
                                              - g_cos * jnp.sin(b))
    else:
        g_dists = g_x[:, off:off + Dd]

    pad = spec.craw - (Fi + Dd + E + 1)
    graw = jnp.concatenate(
        [g_feat, g_dists, g_extras, g_w]
        + ([jnp.zeros((T, pad), jnp.float32)] if pad else []), axis=-1)
    graw_ref[:] = graw


def _accum(ref, val):
    ref[:] += val.astype(ref.dtype)


def _weight_blocks(spec: DecodeSpec):
    """BlockSpecs for the weight operands: full arrays, constant index map
    (stay resident in VMEM across the sequential grid)."""
    specs = []
    for _ in range(spec.L1 + spec.L3):
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))   # W
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))   # b [1, H]
    specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))       # wa [1, H]
    specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))       # ba [1, 1]
    return specs


def _prep_weights(params, spec: DecodeSpec):
    """XLA aggregator params -> kernel weight operand list (padded, permuted,
    cast). Returns flat list [W1_0, b1_0, ..., W3_i, b3_i, wa, ba]."""
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    perm = pe_permutation(spec)
    out = []
    for i, layer in enumerate(params["block1"]):
        w = layer["w"]
        if i == 0:
            w = w[perm]
            w = jnp.pad(w, ((0, spec.x1p - spec.x1), (0, 0)))
        out += [w.astype(cdt), layer["b"].reshape(1, -1).astype(jnp.float32)]
    for i, layer in enumerate(params["block3"]):
        w = layer["w"]
        if i == 0:
            w = jnp.pad(w, ((0, spec.x3p - w.shape[0]), (0, 0)))
        out += [w.astype(cdt), layer["b"].reshape(1, -1).astype(jnp.float32)]
    wa = params["alpha"][0]["w"].reshape(1, -1)               # [1, H]
    ba = params["alpha"][0]["b"].reshape(1, 1)
    out += [wa.astype(jnp.float32), ba.astype(jnp.float32)]
    return out


def _pack_raw(feat, dists, extras, w, spec: DecodeSpec, T: int):
    M = feat.shape[0]
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    used = spec.Fi + spec.Dd + spec.E + 1
    raw = jnp.concatenate([feat, dists, extras, w], axis=-1).astype(cdt)
    Mp = _rup(M, T)
    raw = jnp.pad(raw, ((0, Mp - M), (0, spec.craw - used)))
    return raw, Mp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_decode(feat, dists, extras, w, params, spec: DecodeSpec):
    """feat [M, Fi], dists [M, Dd], extras [M, E], w [M, 1] (weight*conf,
    zero on masked rows); params: aggregator param dict (block1/block3/alpha).

    Returns (fagg [M/K, H] f32, alpha [M/K, 1] f32): the weighted K-sums of
    the final shading feature and the per-point density
    (point_aggregators.py:600-620, agg_intrp_order=2)."""
    return _fwd_impl(feat, dists, extras, w, params, spec)


def _fwd_impl(feat, dists, extras, w, params, spec: DecodeSpec):
    M = feat.shape[0]
    assert M % spec.K == 0
    T = spec.tile
    raw, Mp = _pack_raw(feat, dists, extras, w, spec, T)
    weights = _prep_weights(params, spec)
    grid = Mp // T
    G = T // spec.K

    kernel = functools.partial(_fwd_kernel, spec=spec)
    fagg, aagg = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((T, spec.craw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + _weight_blocks(spec),
        out_specs=[
            pl.BlockSpec((G, spec.H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp // spec.K, spec.H), jnp.float32),
            jax.ShapeDtypeStruct((Mp // spec.K, 128), jnp.float32),
        ],
        interpret=spec.interpret,
    )(raw, *weights)
    Mk = M // spec.K
    return fagg[:Mk], aagg[:Mk, :1]


def _fwd_rule(feat, dists, extras, w, params, spec: DecodeSpec):
    out = _fwd_impl(feat, dists, extras, w, params, spec)
    return out, (feat, dists, extras, w, params)


def _bwd_rule(spec: DecodeSpec, res, grads):
    feat, dists, extras, w, params = res
    g_fagg, g_alpha = grads
    M = feat.shape[0]
    T = spec.tile_bwd
    raw, Mp = _pack_raw(feat, dists, extras, w, spec, T)
    weights = _prep_weights(params, spec)
    grid = Mp // T
    G = T // spec.K
    Mk = Mp // spec.K

    gf = jnp.pad(g_fagg.astype(jnp.float32),
                 ((0, Mk - g_fagg.shape[0]), (0, 0)))
    ga = jnp.pad(g_alpha.astype(jnp.float32),
                 ((0, Mk - g_alpha.shape[0]), (0, 127)))

    # dW output shapes mirror the kernel operand list
    out_specs = [pl.BlockSpec((T, spec.craw), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((Mp, spec.craw), jnp.float32)]
    for j in range(0, len(weights) - 2, 2):
        Wshape = weights[j].shape
        out_specs.append(pl.BlockSpec(Wshape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(Wshape, jnp.float32))
        bshape = weights[j + 1].shape
        out_specs.append(pl.BlockSpec(bshape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(bshape, jnp.float32))
    out_specs.append(pl.BlockSpec((1, spec.H), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))    # dwa
    out_shapes.append(jax.ShapeDtypeStruct((1, spec.H), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))    # dba
    out_shapes.append(jax.ShapeDtypeStruct((1, 128), jnp.float32))

    kernel = functools.partial(_bwd_kernel, spec=spec)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=(
            [pl.BlockSpec((T, spec.craw), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)]
            + _weight_blocks(spec)
            + [pl.BlockSpec((G, spec.H), lambda i: (i, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((G, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=spec.interpret,
    )(raw, *weights, gf, ga)

    graw = outs[0][:M]
    dws = outs[1:]
    Fi, Dd, E = spec.Fi, spec.Dd, spec.E
    g_feat = graw[:, :Fi]
    g_dists = graw[:, Fi:Fi + Dd]
    g_extras = graw[:, Fi + Dd:Fi + Dd + E]
    g_w = graw[:, Fi + Dd + E:Fi + Dd + E + 1]

    # un-permute / un-pad dW back into the params pytree layout
    perm = pe_permutation(spec)
    inv = np.argsort(perm)
    g_params = {"block1": [], "block3": [], "alpha": []}
    idx = 0
    for i in range(spec.L1):
        dW = dws[idx][:spec.x1][inv] if i == 0 else dws[idx]
        g_params["block1"].append({"w": dW, "b": dws[idx + 1][0]})
        idx += 2
    for i in range(spec.L3):
        dW = dws[idx][:spec.H + E] if i == 0 else dws[idx]
        g_params["block3"].append({"w": dW, "b": dws[idx + 1][0]})
        idx += 2
    g_params["alpha"] = [{"w": dws[idx][0][:, None],
                          "b": dws[idx + 1][0, :1]}]
    return g_feat, g_dists, g_extras, g_w, g_params


fused_decode.defvjp(_fwd_rule, _bwd_rule)
