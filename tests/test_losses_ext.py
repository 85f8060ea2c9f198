"""Extended loss items (depth / background) and visual-hull masking."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.losses import compute_losses
from pointnerf_tpu.mvs.masking import alpha_masking, gen_bg_points

from test_render import make_batch, synthetic_scene, setup


def test_depth_and_bg_losses():
    cfg = tiny_test_config()
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss,
        depth_loss_items=("ray_depth_masked_coarse_depth",),
        depth_loss_weights=(0.1,),
        bg_loss_items=("coarse_is_background",),
        bg_loss_weights=(0.1,)))
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot)
    from pointnerf_tpu.models.renderer import render_rays
    out = render_rays(params, pc, st, grid, batch, cfg)
    assert out.coarse_depth.shape == (64, 1)
    gt_depth = jnp.full((64,), 3.0)
    total, items = compute_losses(out, batch.gt_image, cfg.loss,
                                  gt_depth=gt_depth,
                                  bg_color=jnp.ones(3))
    assert "loss_ray_depth_masked_coarse_depth" in items
    assert "loss_coarse_is_background" in items
    assert np.isfinite(float(total))
    # depth loss pulls predicted depth toward gt on hit rays
    assert float(items["loss_ray_depth_masked_coarse_depth"]) > 0


def test_alpha_masking_visual_hull():
    # points on a line; one camera sees alpha=1 only in the image center
    pts = np.stack([np.linspace(-1, 1, 50), np.zeros(50), np.full(50, 4.0)],
                   -1).astype(np.float32)
    H = W = 32
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    alpha = np.zeros((H, W), np.float32)
    alpha[:, 12:20] = 1.0  # only central columns opaque
    keep = alpha_masking(pts, [alpha], [K], [np.eye(4, dtype=np.float32)],
                         near_far=(2.0, 6.0), keep_outside_view=False)
    x_img = 40.0 * pts[:, 0] / 4.0 + 16
    want = (x_img >= 12) & (x_img < 20)
    got_float = keep.astype(int)
    # floor-based projection: allow off-by-boundary
    assert (got_float == want.astype(int)).mean() > 0.9
    assert 0 < keep.sum() < 50


def test_gen_bg_points_plane_intersection():
    campos = np.array([0.0, 2.0, 0.0], np.float32)
    raydir = np.array([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    plane_pnt = np.zeros(3, np.float32)
    plane_normal = np.array([0.0, -1.0, 0.0], np.float32)
    pts, valid = gen_bg_points(campos, raydir, plane_pnt, plane_normal)
    v = np.asarray(valid)
    assert v[0] and not v[1]  # downward ray hits, upward ray doesn't
    np.testing.assert_allclose(np.asarray(pts)[0], [0, 0, 0], atol=1e-6)
