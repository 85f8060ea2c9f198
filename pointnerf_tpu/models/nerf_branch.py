"""Global radiance-field branch for the proposal-NeRF hybrid.

The reference fork's `--proposal_nerf` mode (neural_points_volumetric_
multiseq_model.py:290-449) augments point-based rendering with a NeRF MLP:
N_importance extra samples per ray are drawn from a coarse NeRF's proposal
distribution, decoded by the NeRF, z-sorted INTO the point samples, and the
merged sequence is marched once — the radiance field covers what the point
cloud misses (backgrounds, holes) while points keep the detail. The fork's
aggregator engine for it was never committed upstream (SURVEY §2.4), so
this is a ground-up TPU-native design of the same capability, not a port:
static shapes throughout (fixed Nc/Ni sample counts, one [R, SR+Ni] sort),
PE-MLP evaluated as batched matmuls in the configured compute dtype.

Pieces:
  init_nerf_params   — PE-MLP (classic NeRF trunk + sigma/color heads)
  nerf_eval          — (sigma [.,1], color [.,C]) at world points + viewdir
  coarse_ray_march   — stratified Nc samples -> proposal weights + coarse rgb
  importance_z       — inverse-CDF draw of Ni z's from the proposal weights
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.pe import pe_dim, positional_encoding


def _linear_init(key, n_in: int, n_out: int):
    k1, k2 = jax.random.split(key)
    lim = (6.0 / (n_in + n_out)) ** 0.5
    return {"w": jax.random.uniform(k1, (n_in, n_out), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((n_out,), jnp.float32)}


def init_nerf_params(key, cfg) -> Dict:
    """cfg: full PointNeRFConfig — RenderConfig.nerf_* sizes the MLP, the
    color head width follows AggregatorConfig.shading_color_channel_num."""
    r = cfg.render
    C = cfg.agg.shading_color_channel_num
    x_in = pe_dim(3, r.nerf_pe_xyz, ori=True)
    d_in = pe_dim(3, r.nerf_pe_dir, ori=True)
    H = r.nerf_hidden
    keys = jax.random.split(key, r.nerf_layers + 3)
    trunk = []
    n_in = x_in
    for i in range(r.nerf_layers):
        trunk.append(_linear_init(keys[i], n_in, H))
        n_in = H
    sigma = _linear_init(keys[-3], H, 1)
    # start near-transparent (softplus(-3) ~ 0.05): a fresh field must not
    # fog over the already-informative point branch
    sigma["b"] = sigma["b"] - 3.0
    return {
        "trunk": trunk,
        "sigma": sigma,
        "rgb1": _linear_init(keys[-2], H + d_in, H // 2),
        "rgb2": _linear_init(keys[-1], H // 2, C),
    }


def _apply(p, x):
    return x @ p["w"] + p["b"]


def nerf_eval(params: Dict, xyz: jnp.ndarray, viewdir: jnp.ndarray, cfg,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Decode [..., 3] world points (+ per-point view dirs) to
    [..., 1 + C] (sigma, color channels) — the same feature layout the
    point aggregator emits, so the two branches march together."""
    r = cfg.render
    hx = positional_encoding(xyz, r.nerf_pe_xyz, ori=True)
    hd = positional_encoding(
        viewdir / jnp.maximum(jnp.linalg.norm(viewdir, axis=-1,
                                              keepdims=True), 1e-8),
        r.nerf_pe_dir, ori=True)
    h = hx.astype(compute_dtype)
    for lp in params["trunk"]:
        h = jax.nn.relu(_apply(jax.tree.map(
            lambda a: a.astype(compute_dtype), lp), h))
    sigma = jax.nn.softplus(
        _apply(params["sigma"], h.astype(jnp.float32)))
    h2 = jnp.concatenate([h, hd.astype(compute_dtype)], axis=-1)
    h2 = jax.nn.relu(_apply(jax.tree.map(
        lambda a: a.astype(compute_dtype), params["rgb1"]), h2))
    color = jax.nn.sigmoid(_apply(params["rgb2"],
                                  h2.astype(jnp.float32)))
    return jnp.concatenate([sigma, color], axis=-1)


def coarse_ray_march(params: Dict, campos, raydir, cfg,
                     key=None, train: bool = False,
                     compute_dtype=jnp.float32
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stratified coarse NeRF pass: returns (z [R, Nc], weights [R, Nc],
    coarse rgb [R, C]) — the proposal distribution + the reference's
    `nerf_coarse_raycolor` output."""
    r = cfg.render
    R = raydir.shape[0]
    Nc = r.nerf_coarse_samples
    edges = jnp.linspace(r.near_plane, r.far_plane, Nc + 1,
                         dtype=jnp.float32)
    lo, hi = edges[:-1], edges[1:]
    if train and key is not None:
        u = jax.random.uniform(key, (R, Nc), dtype=jnp.float32)
    else:
        u = jnp.full((R, Nc), 0.5, jnp.float32)
    z = lo[None] + (hi - lo)[None] * u                         # [R, Nc]
    pts = campos[None, None, :] + z[..., None] * raydir[:, None, :]
    feats = nerf_eval(params, pts,
                      jnp.broadcast_to(raydir[:, None, :], pts.shape),
                      cfg, compute_dtype)                      # [R, Nc, 1+C]
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1],
         jnp.full((R, 1), (r.far_plane - r.near_plane) / Nc)], -1)
    alpha = 1.0 - jnp.exp(-feats[..., 0] * dists)
    acc = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    acc = jnp.concatenate([jnp.ones_like(acc[:, :1]), acc[:, :-1]], -1)
    w = alpha * acc                                            # [R, Nc]
    rgb = jnp.sum(w[..., None] * feats[..., 1:], axis=-2)
    return z, w, rgb


def importance_z(z: jnp.ndarray, weights: jnp.ndarray, n: int,
                 det: bool = True, key=None) -> jnp.ndarray:
    """Inverse-CDF draw of n NEW z's from the proposal weights (dense
    comparison-count searchsorted — same TPU-friendly pattern as
    ops/query.sample_pdf, but returning only the new samples since they
    merge with the POINT samples, not the coarse NeRF ones)."""
    R, S = z.shape
    bins = 0.5 * (z[:, 1:] + z[:, :-1])                        # [R, S-1]
    w = weights[:, 1:-1] + 1e-5                                # [R, S-2]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)
    if det or key is None:
        u = jnp.broadcast_to(
            jnp.linspace(0.02, 0.98, n, dtype=jnp.float32), (R, n))
    else:
        u = jax.random.uniform(key, (R, n), dtype=jnp.float32)
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1,
                   dtype=jnp.int32)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = jnp.take_along_axis(cdf, below, axis=1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=1)
    bin_b = jnp.take_along_axis(bins, below, axis=1)
    bin_a = jnp.take_along_axis(bins, above, axis=1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    return bin_b + (u - cdf_b) / denom * (bin_a - bin_b)       # [R, n]
