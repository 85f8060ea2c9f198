"""End-to-end: render a synthetic scene, train a few steps, check learning."""
import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.camera import get_dtu_raydir, pers2w, w2pers
from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.points import make_point_cloud
from pointnerf_tpu.models.renderer import RayBatch, render_rays
from pointnerf_tpu.train.step import (create_train_state, eval_step,
                                      refresh_grid, train_step)


def synthetic_scene(seed=0, n_pts=400):
    """A small ball of points in front of a camera at -z looking at +z."""
    rng = np.random.RandomState(seed)
    xyz = rng.normal(0, 0.25, (n_pts, 3)).astype(np.float32)
    xyz = np.clip(xyz, -0.9, 0.9)
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    camrot = np.eye(3, dtype=np.float32)  # +z forward (OpenCV)
    return xyz, campos, camrot


def make_batch(campos, camrot, R=64, seed=1, near=2.0, far=4.5):
    rng = np.random.RandomState(seed)
    intr = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)
    pix = rng.randint(0, 64, (R, 2)).astype(np.float32)
    raydir = get_dtu_raydir(pix, intr, camrot, True).astype(np.float32)
    gt = rng.rand(R, 3).astype(np.float32) * 0.0 + np.array([0.2, 0.5, 0.8],
                                                            np.float32)
    return RayBatch(campos=jnp.asarray(campos), camrotc2w=jnp.asarray(camrot),
                    raydir=jnp.asarray(raydir), pixel_idx=jnp.asarray(pix, jnp.int32),
                    near=jnp.asarray(near), far=jnp.asarray(far),
                    gt_image=jnp.asarray(gt))


def test_w2pers_roundtrip():
    rng = np.random.RandomState(0)
    xyz = rng.randn(50, 3).astype(np.float32)
    xyz[:, 2] += 5.0
    # random rotation
    q = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    campos = np.array([0.2, -0.3, -2.0], np.float32)
    pers = w2pers(jnp.asarray(xyz), jnp.asarray(q), jnp.asarray(campos))
    back = pers2w(pers, jnp.asarray(q), jnp.asarray(campos))
    np.testing.assert_allclose(np.asarray(back), xyz, rtol=1e-4, atol=1e-4)


def setup(cfg, seed=0):
    xyz, campos, camrot = synthetic_scene(seed)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    grid = refresh_grid(pc, st, cfg)
    return pc, st, params, grid, campos, camrot


def test_render_forward_shapes_and_background():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot)
    out = render_rays(params, pc, st, grid, batch, cfg)
    R, SR, K = 64, cfg.query.SR, cfg.query.K
    assert out.coarse_raycolor.shape == (R, 3)
    assert out.coarse_point_opacity.shape == (R, SR)
    assert out.ray_mask.shape == (R,)
    assert bool(jnp.any(out.ray_mask)), "some rays should hit the cloud"
    # missed rays must render pure background
    missed = ~np.asarray(out.ray_mask)
    if missed.any():
        np.testing.assert_allclose(
            np.asarray(out.coarse_raycolor)[missed],
            np.ones((missed.sum(), 3)), atol=1e-5)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()


def test_gradients_flow_and_are_finite():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot)

    def loss(p, feats):
        pc2 = pc._replace(features=feats)
        out = render_rays(p, pc2, st, grid, batch, cfg)
        return jnp.mean((out.coarse_raycolor - batch.gt_image) ** 2)

    g_mlp, g_feat = jax.grad(loss, argnums=(0, 1))(params, pc.features)
    leaves = jax.tree.leaves(g_mlp)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves), "mlp grads all zero"
    g_feat = np.asarray(g_feat)
    assert np.isfinite(g_feat).all()
    assert np.abs(g_feat[:400]).max() > 0, "feature grads all zero"
    # padded (dead) points must receive zero gradient
    assert np.abs(g_feat[400:]).max() == 0


def test_training_reduces_loss():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    state = create_train_state(jax.random.PRNGKey(3), params, pc, cfg)
    batch = make_batch(campos, camrot)
    losses = []
    for _ in range(30):
        state, items = train_step(state, st, grid, batch, cfg)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"


def test_eval_step_deterministic():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot)
    p = {"mlp": params, "points": pc}
    o1 = eval_step(p, st, grid, batch, cfg)
    o2 = eval_step(p, st, grid, batch, cfg)
    np.testing.assert_array_equal(np.asarray(o1.coarse_raycolor),
                                  np.asarray(o2.coarse_raycolor))
