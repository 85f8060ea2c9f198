"""Proposal-NeRF hybrid (RenderConfig.nerf_importance, models/nerf_branch.py
+ renderer._hybrid_march): merged-march correctness against a numpy oracle,
rays that miss the point cloud get radiance-field color, gradients reach
both branches, and hybrid off leaves the render byte-identical."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.nerf_branch import (coarse_ray_march, importance_z,
                                              init_nerf_params, nerf_eval)
from pointnerf_tpu.models.renderer import render_rays

from test_render import make_batch, setup, synthetic_scene  # noqa: F401


def _cfg(ni=8, nc=16):
    cfg = tiny_test_config()
    return cfg.replace(render=dataclasses.replace(
        cfg.render, nerf_importance=ni, nerf_coarse_samples=nc,
        nerf_hidden=32, nerf_layers=2, nerf_pe_xyz=4, nerf_pe_dir=2))


def _params(cfg, base_params, seed=3):
    p = dict(base_params)
    p["nerf"] = init_nerf_params(jax.random.PRNGKey(seed), cfg)
    return p


def test_off_is_identity():
    cfg0 = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg0)
    batch = make_batch(campos, camrot, R=64)
    out0 = render_rays(params, pc, st, grid, batch, cfg0)
    # params carrying an unused nerf subtree must not change anything
    cfgh = _cfg()
    ph = _params(cfgh, params)
    out1 = render_rays(ph, pc, st, grid, batch, cfg0)
    np.testing.assert_array_equal(np.asarray(out0.coarse_raycolor),
                                  np.asarray(out1.coarse_raycolor))
    assert out0.nerf_coarse_raycolor is None


def test_importance_z_in_range_and_peaked():
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 32)[None], (4, 32))
    w = jnp.zeros((4, 32)).at[:, 20].set(10.0).at[:, 21].set(10.0)
    zi = importance_z(z, w, 8, det=True)
    assert zi.shape == (4, 8)
    zin = np.asarray(zi)
    assert zin.min() >= 2.0 and zin.max() <= 6.0
    # mass concentrates near the peak (z ~ 2 + 4*20.5/31 ~ 4.6)
    assert np.all(np.abs(zin - 4.65) < 0.6)


def test_hybrid_covers_missed_rays():
    """A ray pointing away from the cloud has no point samples; the hybrid
    color must come from the radiance field, not the background fill."""
    cfg = _cfg()
    pc, st, params, grid, campos, camrot = setup(cfg)
    ph = _params(cfg, params)
    batch = make_batch(campos, camrot, R=64)
    out = render_rays(ph, pc, st, grid, batch, cfg)
    assert out.nerf_coarse_raycolor is not None
    assert out.nerf_coarse_raycolor.shape == out.coarse_raycolor.shape
    miss = ~np.asarray(out.ray_mask)
    if miss.any():
        cfg0 = tiny_test_config()
        out0 = render_rays(params, pc, st, grid, batch, cfg0)
        a = np.asarray(out.coarse_raycolor)[miss]
        b = np.asarray(out0.coarse_raycolor)[miss]
        # point-only render fills missed rays with pure bg; the hybrid adds
        # radiance-field opacity on at least some of them
        assert not np.allclose(a, b)


def test_merged_march_oracle():
    """One ray, hand-built point + nerf samples: the merged march equals a
    numpy alpha-composite of the z-sorted union."""
    cfg = _cfg(ni=4, nc=16)
    pc, st, params, grid, campos, camrot = setup(cfg)
    ph = _params(cfg, params)
    batch = make_batch(campos, camrot, R=8)
    out = render_rays(ph, pc, st, grid, batch, cfg)

    # oracle: recompute from the pieces the renderer exposes
    from pointnerf_tpu.models.nerf_branch import (coarse_ray_march,
                                                  importance_z, nerf_eval)
    rd2 = np.sum(np.asarray(batch.raydir) ** 2, -1, keepdims=True)
    t_pts = np.sum((np.asarray(out.sample_loc_w)
                    - np.asarray(batch.campos)[None, None])
                   * np.asarray(batch.raydir)[:, None], -1) / rd2
    valid = np.asarray(out.ray_valid)
    t_pts = np.where(valid, t_pts, cfg.render.far_plane + 1.0)

    z_c, w_c, _ = coarse_ray_march(ph["nerf"], batch.campos, batch.raydir,
                                   cfg)
    z_i = np.asarray(importance_z(z_c, w_c, 4, det=True))
    pts = (np.asarray(batch.campos)[None, None]
           + z_i[..., None] * np.asarray(batch.raydir)[:, None])
    fn = np.asarray(nerf_eval(ph["nerf"], jnp.asarray(pts),
                              jnp.broadcast_to(batch.raydir[:, None, :],
                                               pts.shape), cfg))

    # capture the renderer's own per-sample point features through a shim
    from pointnerf_tpu.models import renderer as R

    captured = {}
    orig = R._hybrid_march

    def shim(p, o, b, c, **kw):
        captured["feats"] = np.asarray(o.sample_features)
        return orig(p, o, b, c, **kw)

    R._hybrid_march = shim
    try:
        out2 = render_rays(ph, pc, st, grid, batch, cfg)
    finally:
        R._hybrid_march = orig
    fp = np.where(valid[..., None], captured["feats"], 0.0)

    z_all = np.concatenate([t_pts, z_i], -1)
    f_all = np.concatenate([fp, fn], -2)
    v_all = np.concatenate([valid, np.ones_like(z_i, bool)], -1)
    order = np.argsort(z_all, axis=-1, kind="stable")
    z_s = np.take_along_axis(z_all, order, -1)
    f_s = np.take_along_axis(f_all, order[..., None], -2)
    v_s = np.take_along_axis(v_all, order, -1)
    vz = cfg.query.vsize[2]
    d = np.concatenate([z_s[:, 1:] - z_s[:, :-1],
                        np.full_like(z_s[:, :1], vz)], -1)
    nxt_inv = np.concatenate(
        [~v_s[:, 1:], np.ones_like(v_s[:, :1])], -1)
    d = np.where(nxt_inv, vz, d)
    sigma = np.where(v_s, f_s[..., 0], 0.0)
    alpha = 1.0 - np.exp(-sigma * d)
    acc = np.cumprod(1.0 - alpha + 1e-10, -1)
    acc = np.concatenate([np.ones_like(acc[:, :1]), acc[:, :-1]], -1)
    w = alpha * acc
    color = (w[..., None] * f_s[..., 1:]).sum(-2)
    bg = np.asarray(cfg.render.bg_color, np.float32)
    bgt = np.prod(1.0 - alpha + 1e-10, -1, keepdims=True)
    color = color + bgt * bg[None]
    np.testing.assert_allclose(np.asarray(out2.coarse_raycolor), color,
                               rtol=2e-4, atol=2e-4)


def test_gradients_reach_both_branches():
    cfg = _cfg()
    pc, st, params, grid, campos, camrot = setup(cfg)
    ph = _params(cfg, params)
    batch = make_batch(campos, camrot, R=64)

    def loss(p, feats):
        pc2 = pc._replace(features=feats)
        out = render_rays(p, pc2, st, grid, batch, cfg,
                          key=jax.random.PRNGKey(0), train=True)
        m = jnp.mean((out.coarse_raycolor - batch.gt_image) ** 2)
        m = m + jnp.mean((out.nerf_coarse_raycolor - batch.gt_image) ** 2)
        return m

    g_p, g_f = jax.grad(loss, argnums=(0, 1))(ph, pc.features)
    nerf_norm = sum(float(jnp.sum(jnp.abs(x)))
                    for x in jax.tree.leaves(g_p["nerf"]))
    agg_norm = sum(float(jnp.sum(jnp.abs(x)))
                   for x in jax.tree.leaves(
                       {k: v for k, v in g_p.items() if k != "nerf"}))
    assert nerf_norm > 0.0
    assert agg_norm > 0.0
    assert float(jnp.sum(jnp.abs(g_f))) > 0.0


def test_creation_signals_consistent():
    """nerf_mass/loc_w/color come out of the merged march: mass in [0,1],
    locations on the ray between near and far."""
    cfg = _cfg()
    pc, st, params, grid, campos, camrot = setup(cfg)
    ph = _params(cfg, params)
    batch = make_batch(campos, camrot, R=32)
    out = render_rays(ph, pc, st, grid, batch, cfg)
    m = np.asarray(out.nerf_mass)
    assert m.shape == (32, 1)
    assert np.all(m >= 0.0) and np.all(m <= 1.0 + 1e-5)
    loc = np.asarray(out.nerf_loc_w)
    rd = np.asarray(batch.raydir)
    t = np.sum((loc - np.asarray(campos)[None]) * rd, -1) / np.sum(rd * rd, -1)
    sig = m[:, 0] > 1e-3  # rays with real field mass
    if sig.any():
        assert t[sig].min() >= cfg.render.near_plane - 1e-3
        assert t[sig].max() <= cfg.render.far_plane + 1e-3


def test_nerf_create_points_candidates():
    """Probe accumulation turns confident field mass on missed rays into
    grow candidates at the field's expected depth (synthetic maps)."""
    from pointnerf_tpu.train.grow import (accumulate_probe_candidates,
                                          finalize_probe_candidates)
    cfg = _cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, nerf_create_points=True, prob_thresh=0.5, prob_mul=0.4))
    H = W = 4
    n = H * W
    pix = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1).reshape(-1, 2)
    item = {"pixel_idx": pix,
            "gt_image": np.full((n, 3), 0.5, np.float32),
            "raydir": np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))}
    maps = {
        "ray_mask": np.zeros((H, W, 1), np.float32),      # every ray missed
        "ray_max_shading_opacity": np.zeros((H, W, 1), np.float32),
        "ray_max_sample_loc_w": np.zeros((H, W, 3), np.float32),
        "shading_avg_embedding": np.zeros(
            (H, W, cfg.agg.point_features_dim), np.float32),
        "shading_avg_color": np.zeros((H, W, 3), np.float32),
        "shading_avg_dir": np.zeros((H, W, 3), np.float32),
        "shading_avg_conf": np.zeros((H, W, 1), np.float32),
        "nerf_mass": np.zeros((H, W, 1), np.float32),
        "nerf_loc_w": np.zeros((H, W, 3), np.float32),
        "nerf_color": np.zeros((H, W, 3), np.float32),
    }
    maps["nerf_mass"][1, 2, 0] = 0.9          # one confident field hit
    maps["nerf_loc_w"][1, 2] = [0.1, 0.2, 3.0]
    maps["nerf_color"][1, 2] = [1.0, 0.0, 0.0]
    adds = {k: [] for k in ("xyz", "embedding", "color", "dirs", "conf")}
    accumulate_probe_candidates(adds, maps, item, cfg, (W, H),
                                np.ones(3, np.float32))
    cand = finalize_probe_candidates(adds, cfg)
    assert cand.xyz.shape == (1, 3)
    np.testing.assert_allclose(cand.xyz[0], [0.1, 0.2, 3.0])
    np.testing.assert_allclose(cand.color[0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(cand.conf[0], [0.9 * 0.4], rtol=1e-6)
    np.testing.assert_allclose(cand.dirs[0], [0, 0, -1.0])
    # switch off -> no candidates
    cfg0 = cfg.replace(train=dataclasses.replace(
        cfg.train, nerf_create_points=False))
    adds0 = {k: [] for k in ("xyz", "embedding", "color", "dirs", "conf")}
    accumulate_probe_candidates(adds0, maps, item, cfg0, (W, H),
                                np.ones(3, np.float32))
    assert finalize_probe_candidates(adds0, cfg0).xyz.shape == (0, 3)
