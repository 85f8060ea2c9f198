"""MVSNeRF-style volumetric rendering from a regularized cost volume.

Compact reimplementation of the reference's MVSNeRF stack
(models/mvs/models.py:148-570 `Renderer_ours`/`MVSNeRF` + renderer.py:66-183
`raw2outputs`/`rendering`): rays are marched through the reference-view
frustum, per-sample features are trilinearly interpolated from the 3D
neuralized cost volume (NDC-aligned) and concatenated with source-image
colors sampled at the projections; a small MLP decodes density + radiance,
composited with the shared ray-march core. Used by the generalization mode
0/1 paths as the volume-rendering branch alongside the point branch.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.ray_march import alpha_blend, radiance_render, ray_march
from ..ops.pe import positional_encoding
from ..ops.sample2d import bilinear_sample


def trilinear_sample_volume(vol: jnp.ndarray, ndc: jnp.ndarray) -> jnp.ndarray:
    """vol: [D, H, W, C]; ndc: [..., 3] in [0,1]³ (x->W, y->H, z->D).
    Zero padding outside. Returns [..., C]."""
    D, H, W, C = vol.shape
    x = ndc[..., 0] * (W - 1)
    y = ndc[..., 1] * (H - 1)
    z = ndc[..., 2] * (D - 1)

    def tap(zi, yi, xi):
        inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
               & (zi >= 0) & (zi < D))
        v = vol[jnp.clip(zi, 0, D - 1), jnp.clip(yi, 0, H - 1),
                jnp.clip(xi, 0, W - 1)]
        return v * inb[..., None]

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    tx, ty, tz = (x - x0)[..., None], (y - y0)[..., None], (z - z0)[..., None]
    x0i, y0i, z0i = (x0.astype(jnp.int32), y0.astype(jnp.int32),
                     z0.astype(jnp.int32))
    c00 = tap(z0i, y0i, x0i) * (1 - tx) + tap(z0i, y0i, x0i + 1) * tx
    c01 = tap(z0i, y0i + 1, x0i) * (1 - tx) + tap(z0i, y0i + 1, x0i + 1) * tx
    c10 = tap(z0i + 1, y0i, x0i) * (1 - tx) + tap(z0i + 1, y0i, x0i + 1) * tx
    c11 = (tap(z0i + 1, y0i + 1, x0i) * (1 - tx)
           + tap(z0i + 1, y0i + 1, x0i + 1) * tx)
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


class MVSNeRFDecoder(nn.Module):
    """Renderer_ours-style MLP (models.py:148-247): PE(xyz) + PE(dir) +
    volume features + source colors -> (sigma, rgb)."""
    depth: int = 6
    width: int = 128
    skips: Tuple[int, ...] = (4,)
    pos_freqs: int = 10
    dir_freqs: int = 4

    @nn.compact
    def __call__(self, xyz, viewdirs, feat):
        """xyz, viewdirs: [..., 3]; feat: [..., F]. Returns [..., 4]
        (sigma ++ rgb)."""
        p = positional_encoding(xyz, self.pos_freqs, ori=True)
        d = positional_encoding(viewdirs, self.dir_freqs, ori=True)
        h = jnp.concatenate([p, feat], axis=-1)
        inp = h
        for i in range(self.depth):
            h = nn.relu(nn.Dense(self.width)(h))
            if i in self.skips:
                h = jnp.concatenate([inp, h], axis=-1)
        sigma = nn.Dense(1)(h)
        bottleneck = nn.Dense(self.width)(h)
        h2 = nn.relu(nn.Dense(self.width // 2)(
            jnp.concatenate([bottleneck, d], axis=-1)))
        rgb = nn.Dense(3)(h2)
        return jnp.concatenate([nn.relu(sigma), nn.sigmoid(rgb)], axis=-1)


# --------------------------------------------------------------------------
# Reference decoder variants (models/mvs/models.py:148-570): the `net_type`
# v0/v1/v2 + color_fusion family. Input convention follows the reference:
# one packed tensor x = [pts_ch | feat_ch | views_ch]. Output order is the
# reference's (rgb, alpha[, colors]); use `reorder_rgba` for our ray_march
# (which expects alpha first).
# --------------------------------------------------------------------------

class MultiHeadAttention(nn.Module):
    """Post-LN multi-head attention (models.py:96-145): bias-free q/k/v/fc
    projections, residual add, LayerNorm(eps=1e-6); mask zeros attention
    logits per query row (ScaledDotProductAttention :73-93)."""
    n_head: int
    d_model: int
    d_k: int
    d_v: int

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        b, lq, _ = q.shape
        lk = k.shape[1]
        residual = q
        qh = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_qs")(q)
        kh = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_ks")(k)
        vh = nn.Dense(self.n_head * self.d_v, use_bias=False, name="w_vs")(v)
        qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, lk, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, lk, self.n_head, self.d_v).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k ** 0.5), kh)
        if mask is not None:
            attn = jnp.where(mask[:, None] == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
        out = nn.Dense(self.d_model, use_bias=False, name="fc")(out)
        out = nn.LayerNorm(epsilon=1e-6)(out + residual)
        return out, attn


class _RendererBiasMLP(nn.Module):
    """Shared skip-MLP body of Renderer_ours / Renderer_linear: per-layer
    feature bias folded multiplicatively (v0) or additively (v2), then a
    view-dependent color head. Param names match the torch modules so the
    checkpoint importer covers both variants."""
    D: int = 8
    W: int = 256
    in_ch_pts: int = 63
    in_ch_views: int = 27
    skips: Tuple[int, ...] = (4,)
    bias_mul: bool = True

    @nn.compact
    def __call__(self, x):
        pts = x[..., :self.in_ch_pts]
        views = x[..., -self.in_ch_views:]
        feats = x[..., self.in_ch_pts:-self.in_ch_views]
        bias = nn.Dense(self.W, name="pts_bias")(feats)
        h = pts
        for i in range(self.D):
            z = nn.Dense(self.W, name=f"pts_linears_{i}")(h)
            h = nn.relu(z * bias if self.bias_mul else z + bias)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)
        alpha = nn.relu(nn.Dense(1, name="alpha_linear")(h))
        feature = nn.Dense(self.W, name="feature_linear")(h)
        h = jnp.concatenate([feature, views], axis=-1)
        h = nn.relu(nn.Dense(self.W // 2, name="views_linears_0")(h))
        rgb = nn.sigmoid(nn.Dense(3, name="rgb_linear")(h))
        return jnp.concatenate([rgb, alpha], axis=-1)


class RendererOurs(_RendererBiasMLP):
    """net_type v0 (Renderer_ours, models.py:148-227): skip-MLP over PE(pts)
    MULTIPLIED by a per-sample bias from the volume features, view-dependent
    color head."""
    bias_mul: bool = True


class RendererLinear(_RendererBiasMLP):
    """net_type v2 (Renderer_linear, models.py:467-542): like v0 but the
    feature bias is ADDED (h = lin(h) + bias) — the default net_type."""
    bias_mul: bool = False


class RendererAttention(nn.Module):
    """net_type v1 (Renderer_attention, models.py:387-466): per-view
    (rgb, mask) tokens fused by multi-head attention into per-sample colors;
    those colors join the 8 volume features to form the ADDITIVE MLP bias.
    Expects feats = [vol8 | V x (rgb,mask)=4] with V=3 source views."""
    D: int = 8
    W: int = 256
    in_ch_pts: int = 63
    in_ch_views: int = 27
    n_views: int = 3

    @nn.compact
    def __call__(self, x):
        NR, NS, _ = x.shape
        pts = x[..., :self.in_ch_pts]
        views = x[..., -self.in_ch_views:]
        feats = x[..., self.in_ch_pts:-self.in_ch_views]
        if feats.shape[-1] > 8 + 3:
            # per-view tokens MUST be rgba (rgb + validity mask): reject the
            # rgb-only packing loudly instead of misparsing it — with
            # V=4 rgb-only the reshape below would silently succeed and read
            # a neighboring view's color as the mask channel
            if feats.shape[-1] != 8 + 4 * self.n_views:
                raise ValueError(
                    f"Renderer_attention expects feats = vol8 + "
                    f"{self.n_views} rgba view tokens "
                    f"({8 + 4 * self.n_views} ch; render with "
                    f"per_view_rgba=True), got {feats.shape[-1]} ch")
            colors_in = feats[..., 8:].reshape(NR * NS, self.n_views, 4)
            tok = jnp.concatenate(
                [colors_in,
                 jnp.broadcast_to(feats[..., :8].reshape(NR * NS, 1, 8),
                                  (NR * NS, colors_in.shape[1], 8))], -1)
            tok, _ = MultiHeadAttention(4, 12, 4, 4,
                                        name="color_attention")(tok, tok, tok)
            colors = jnp.sum(
                nn.sigmoid(nn.Dense(3, name="weight_out")(tok)),
                axis=-2).reshape(NR, NS, 3)
        else:
            colors = feats[..., -3:]
        bias = nn.Dense(self.W, name="pts_bias")(
            jnp.concatenate([feats[..., :8], colors], axis=-1))
        h = pts
        for i in range(self.D):                 # no skips in this variant
            h = nn.relu(nn.Dense(self.W, name=f"pts_linears_{i}")(h) + bias)
        alpha = nn.relu(nn.Dense(1, name="alpha_linear")(h))
        feature = nn.Dense(self.W, name="feature_linear")(h)
        h = jnp.concatenate([feature, views], axis=-1)
        h = nn.relu(nn.Dense(self.W // 2, name="views_linears_0")(h))
        rgb = nn.sigmoid(nn.Dense(3, name="rgb_linear")(h))
        # reference: cat([rgb, alpha, colors]) then cat(colors) again (:462-464)
        return jnp.concatenate([rgb, alpha, colors, colors], axis=-1)


class RendererColorFusion(nn.Module):
    """Renderer_color_fusion (models.py:227-306): multiplicative-bias skip
    MLP; color = attention over per-view (feature16, viewdir-token, rgb)
    masked by the per-view validity channel, summed across views."""
    D: int = 8
    W: int = 128
    in_ch_pts: int = 63
    in_ch_views: int = 27
    n_views: int = 3
    skips: Tuple[int, ...] = (4,)

    @nn.compact
    def __call__(self, x):
        NR, NS, _ = x.shape
        pts = x[..., :self.in_ch_pts]
        views = x[..., -self.in_ch_views:]
        feats = x[..., self.in_ch_pts:-self.in_ch_views]
        if feats.shape[-1] != 8 + 4 * self.n_views:
            raise ValueError(
                f"Renderer_color_fusion expects feats = vol8 + "
                f"{self.n_views} rgba view tokens ({8 + 4 * self.n_views} "
                f"ch; render with per_view_rgba=True), got "
                f"{feats.shape[-1]} ch")
        if self.in_ch_views % self.n_views:
            raise ValueError(
                f"in_ch_views={self.in_ch_views} must split across "
                f"n_views={self.n_views} dir tokens (models.py:285)")
        bias = nn.Dense(self.W, name="pts_bias")(feats)
        h = pts
        for i in range(self.D):
            h = nn.relu(nn.Dense(self.W, name=f"pts_linears_{i}")(h) * bias)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)
        alpha = nn.relu(nn.Dense(1, name="alpha_linear")(h))

        vdim = self.in_ch_views // self.n_views
        views_t = views.reshape(NR * NS, self.n_views, vdim)
        rgba = feats[..., 8:].reshape(NR * NS, self.n_views, 4)
        rgb_in = rgba[..., :3]
        feature = nn.relu(nn.Dense(16, name="feature_linear")(h))
        tok = jnp.broadcast_to(feature.reshape(NR * NS, 1, 16),
                               (NR * NS, self.n_views, 16))
        tok = jnp.concatenate([tok, views_t, rgb_in], axis=-1)
        att_dim = 16 + 3 + vdim
        tok, _ = MultiHeadAttention(4, att_dim, 4, 4, name="ray_attention")(
            tok, tok, tok, mask=rgba[..., -1:])
        rgb = nn.sigmoid(nn.Dense(3, name="rgb_out")(tok))
        rgb = jnp.sum(rgb, axis=1).reshape(NR, NS, 3)
        return jnp.concatenate([rgb, alpha], axis=-1)


MVSNERF_DECODERS = {"v0": RendererOurs, "v1": RendererAttention,
                    "v2": RendererLinear, "color_fusion": RendererColorFusion}


def reorder_rgba(raw: jnp.ndarray) -> jnp.ndarray:
    """Reference (rgb, alpha, ...) -> our ray_march layout (alpha, rgb)."""
    return jnp.concatenate([raw[..., 3:4], raw[..., :3]], axis=-1)


class ReferenceMVSNeRF(nn.Module):
    """MVSNeRF wrapper (models.py:543-570): PE embeds pts/dirs (Embedder
    :93-146 — our PE layout differs in channel order, an equivalent
    reparametrization documented in ops/pe.py) and dispatches on net_type.
    Callable with the (xyz, viewdirs, feat) signature render_mvsnerf uses;
    returns (sigma, rgb) in our ray_march order."""
    net_type: str = "v2"
    D: int = 8
    W: int = 256
    pos_freqs: int = 10
    dir_freqs: int = 4
    n_views: int = 3

    @nn.compact
    def __call__(self, xyz, viewdirs, feat):
        p = positional_encoding(xyz, self.pos_freqs, ori=True)
        d = positional_encoding(viewdirs, self.dir_freqs, ori=True)
        cls = MVSNERF_DECODERS[self.net_type]
        w = 128 if self.net_type == "color_fusion" else self.W
        kw = ({"n_views": self.n_views}
              if self.net_type in ("v1", "color_fusion") else {})
        inner = cls(D=self.D, W=w, in_ch_pts=p.shape[-1],
                    in_ch_views=d.shape[-1], name="nerf", **kw)
        squeeze = False
        x = jnp.concatenate([p, feat, d], axis=-1)
        if x.ndim == 2:                      # attention variants need [R,S,·]
            x, squeeze = x[None], True
        raw = inner(x)
        if squeeze:
            raw = raw[0]
        return reorder_rgba(raw)


def world_to_ref_ndc(xyz_w, w2c_ref, K_ref, near: float, far: float,
                     W: int, H: int):
    """World points -> reference-frustum NDC in [0,1]³ (get_ndc_coordinate,
    mvs_utils.py:101-135)."""
    ones = jnp.ones_like(xyz_w[..., :1])
    cam = (jnp.concatenate([xyz_w, ones], -1) @ w2c_ref.T)[..., :3]
    pix = cam @ K_ref.T
    x = pix[..., 0] / jnp.maximum(pix[..., 2], 1e-9) / (W - 1)
    y = pix[..., 1] / jnp.maximum(pix[..., 2], 1e-9) / (H - 1)
    z = (cam[..., 2] - near) / (far - near)
    return jnp.stack([x, y, z], axis=-1)


def render_mvsnerf(decoder_params, decoder,
                   volume: jnp.ndarray, images: jnp.ndarray,
                   Ks: jnp.ndarray, w2cs: jnp.ndarray,
                   campos, raydir, near: float, far: float,
                   n_samples: int = 64,
                   bg_color: Optional[jnp.ndarray] = None,
                   key=None, per_view_rgba: bool = False):
    """March rays through the volume (renderer.py `rendering`:139-183).

    volume [D,h,w,C] (neuralized cost volume at 1/4 res, ref view 0);
    images [V,H,W,3]; raydir [R,3]. Returns (rgb [R,3], depth [R],
    weights [R,S])."""
    V, H, W, _ = images.shape
    if (isinstance(decoder, ReferenceMVSNeRF)
            and decoder.net_type in ("v1", "color_fusion")):
        # the attention decoders consume per-view (rgb, validity) tokens —
        # rgb-only packing would misparse silently (models.py:444,:296)
        if not per_view_rgba:
            raise ValueError(f"net_type={decoder.net_type} requires "
                             f"per_view_rgba=True")
        if V != decoder.n_views:
            raise ValueError(f"net_type={decoder.net_type} built for "
                             f"{decoder.n_views} views, got {V} images")
    R = raydir.shape[0]
    t = jnp.linspace(0.0, 1.0, n_samples)
    tvals = near * (1 - t) + far * t                     # [S]
    if key is not None:
        mids = 0.5 * (tvals[1:] + tvals[:-1])
        upper = jnp.concatenate([mids, tvals[-1:]])
        lower = jnp.concatenate([tvals[:1], mids])
        u = jax.random.uniform(key, (R, n_samples))
        tvals = lower[None] + (upper - lower)[None] * u  # [R,S]
    else:
        tvals = jnp.broadcast_to(tvals[None], (R, n_samples))
    xyz = campos[None, None] + raydir[:, None] * tvals[..., None]

    ndc = world_to_ref_ndc(xyz, w2cs[0], Ks[0], near, far, W, H)
    feat_vol = trilinear_sample_volume(volume, ndc)       # [R,S,C]

    # source-image colors at the projections (build_color_volume analog);
    # per_view_rgba additionally carries an in-frustum validity channel —
    # the mask the attention decoders consume (models.py:444,:296)
    cols = []
    for v in range(V):
        ones = jnp.ones_like(xyz[..., :1])
        cam = (jnp.concatenate([xyz, ones], -1) @ w2cs[v].T)[..., :3]
        z = jnp.maximum(cam[..., 2], 1e-6)
        pix = cam @ Ks[v].T
        px, py = pix[..., 0] / z, pix[..., 1] / z
        cols.append(bilinear_sample(images[v], px, py))
        if per_view_rgba:
            inb = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
                   & (cam[..., 2] > 0)).astype(jnp.float32)
            cols.append(inb[..., None])
    feat = jnp.concatenate([feat_vol] + cols, axis=-1)

    dirs = jnp.broadcast_to(raydir[:, None, :], xyz.shape)
    raw = decoder.apply({"params": decoder_params}, xyz, dirs, feat)

    dists = jnp.diff(tvals, axis=-1,
                     append=tvals[..., -1:] + (far - near) / n_samples)
    dists = dists * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    valid = jnp.ones(raw.shape[:-1], bool)
    (rgb, _pc, opacity, _acc, blend_w, bgT, _bgw) = ray_march(
        dists, valid, raw, radiance_render, alpha_blend, bg_color)
    depth = jnp.sum(blend_w[..., 0] * tvals, axis=-1)
    return rgb, depth, blend_w[..., 0]
