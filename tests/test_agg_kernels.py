"""Learned-weight aggregation kernels (VERDICT r1 #6): feat_intrp, gau_intrp."""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import (_rpy_to_matrix,
                                             init_aggregator_params,
                                             kernel_consumed_channels)
from pointnerf_tpu.models.renderer import render_rays
from pointnerf_tpu.train.step import refresh_grid

from test_render import make_batch, setup, synthetic_scene


def _cfg(kernel, extra_ch, **kw):
    cfg = tiny_test_config()
    return cfg.replace(agg=dataclasses.replace(
        cfg.agg, agg_distance_kernel=kernel,
        point_features_dim=8 + extra_ch, **kw))


def test_feat_intrp_renders_and_trains():
    cfg = _cfg("feat_intrp", 8)  # weight_feat_dim=8 consumed + 8 payload
    assert kernel_consumed_channels(cfg.agg) == 8
    pc, st, params, grid, campos, camrot = setup(cfg)
    assert "feat_weight" in params
    batch = make_batch(campos, camrot)
    out = render_rays(params, pc, st, grid, batch, cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()
    assert bool(jnp.any(out.ray_mask))

    # gradients reach the weight MLP and the consumed feature channels
    def loss(params, pc):
        o = render_rays(params, pc, st, grid, batch, cfg)
        return jnp.mean((o.coarse_raycolor - batch.gt_image) ** 2)

    gp, gpc = jax.grad(loss, argnums=(0, 1))(params, pc)
    gw = np.concatenate([np.asarray(l["w"]).ravel()
                         for l in gp["feat_weight"]])
    assert np.isfinite(gw).all() and np.abs(gw).max() > 0
    gfeat = np.asarray(gpc.features)
    assert np.abs(gfeat[:, :8]).max() > 0  # weight channels get gradient


def test_feat_intrp_weight_xyz_freq_zero():
    """weight_xyz_freq=0: positional_encoding passes the 3 dist channels
    through unchanged, and the weight-MLP input width must follow (was a
    trace-time dot-shape error)."""
    cfg = _cfg("feat_intrp", 8, weight_xyz_freq=0)
    pc, st, params, grid, campos, camrot = setup(cfg)
    out = render_rays(params, pc, st, grid, make_batch(campos, camrot), cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()


def test_gau_intrp_renders():
    cfg = _cfg("gau_intrp", 7)  # 7 gaussian params consumed + 8 payload
    assert kernel_consumed_channels(cfg.agg) == 7
    pc, st, params, grid, campos, camrot = setup(cfg)
    out = render_rays(params, pc, st, grid, make_batch(campos, camrot), cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()
    assert bool(jnp.any(out.ray_mask))


def test_gau_weight_matches_reference_geometrics():
    """Golden: our diag(1/r) @ R(rpy) local-frame transform equals the
    reference's compute_world2local_dist (helpers/geometrics.py:15-42)."""
    import pytest
    torch = pytest.importorskip("torch")
    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.helpers.geometrics import compute_world2local_dist

    rng = np.random.RandomState(0)
    dists = rng.normal(0, 0.1, (2, 3, 4, 5, 3)).astype(np.float32)
    radii = (rng.rand(2, 3, 4, 5, 3).astype(np.float32) * 0.2 + 0.01)
    rpy = rng.uniform(-np.pi / 4, np.pi / 4, (2, 3, 4, 5, 3)
                      ).astype(np.float32)

    ref = compute_world2local_dist(
        torch.from_numpy(dists), torch.from_numpy(radii),
        torch.from_numpy(rpy))[..., 0].numpy()

    rot = _rpy_to_matrix(jnp.asarray(rpy))
    tx = rot / (jnp.asarray(radii)[..., :, None] + 1e-8)
    ours = np.asarray(jnp.einsum("...ij,...j->...i", tx, jnp.asarray(dists)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
