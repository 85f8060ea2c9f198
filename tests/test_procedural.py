"""Procedural multi-object quality-benchmark scenes: intersection oracles,
surface sampling consistency, and renderer behavior."""
import numpy as np
import pytest

from pointnerf_tpu.data.procedural import (BG, Box, CylinderY, Material,
                                           SCENES, Sphere, gt_render,
                                           sample_cloud, sphere_cameras,
                                           view_item)


def test_sphere_intersection_oracle():
    s = Sphere((0.0, 0.0, 0.0), 1.0)
    o = np.array([[0.0, 0.0, -3.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    t, n, hit = s.intersect(o, d)
    assert hit[0] and np.isclose(t[0], 2.0)
    np.testing.assert_allclose(n[0], [0, 0, -1], atol=1e-6)


def test_box_intersection_oracle():
    b = Box((-1, -1, -1), (1, 1, 1))
    o = np.array([[3.0, 0.2, 0.1]], np.float32)
    d = np.array([[-1.0, 0.0, 0.0]], np.float32)
    t, n, hit = b.intersect(o, d)
    assert hit[0] and np.isclose(t[0], 2.0)
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-6)
    # miss
    _, _, miss = b.intersect(np.array([[3.0, 2.0, 0.0]], np.float32), d)
    assert not miss[0]


def test_cylinder_intersection_side_and_cap():
    c = CylinderY(0.0, 0.0, 0.5, -1.0, 1.0)
    o = np.array([[3.0, 0.0, 0.0]], np.float32)
    d = np.array([[-1.0, 0.0, 0.0]], np.float32)
    t, n, hit = c.intersect(o, d)
    assert hit[0] and np.isclose(t[0], 2.5)
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-5)
    # straight down onto the top cap
    o2 = np.array([[0.1, 3.0, 0.0]], np.float32)
    d2 = np.array([[0.0, -1.0, 0.0]], np.float32)
    t2, n2, hit2 = c.intersect(o2, d2)
    assert hit2[0] and np.isclose(t2[0], 2.0)
    np.testing.assert_allclose(n2[0], [0, 1, 0], atol=1e-6)


def test_sampled_points_lie_on_surfaces():
    rng = np.random.RandomState(0)
    s = Sphere((0.2, -0.1, 0.3), 0.4)
    p, n = s.sample(500, rng)
    np.testing.assert_allclose(
        np.linalg.norm(p - np.array(s.center), axis=-1), 0.4, atol=1e-5)
    b = Box((-1, 0, -2), (1, 1, -1))
    p, _ = b.sample(500, rng)
    on_face = (np.isclose(p[:, 0], -1) | np.isclose(p[:, 0], 1)
               | np.isclose(p[:, 1], 0) | np.isclose(p[:, 1], 1)
               | np.isclose(p[:, 2], -2) | np.isclose(p[:, 2], -1))
    assert on_face.all()
    c = CylinderY(0.5, -0.5, 0.1, 0.0, 2.0)
    p, _ = c.sample(500, rng)
    r = np.sqrt((p[:, 0] - 0.5) ** 2 + (p[:, 2] + 0.5) ** 2)
    on = np.isclose(r, 0.1, atol=1e-5) | (
        (r <= 0.1 + 1e-5) & (np.isclose(p[:, 1], 0.0)
                             | np.isclose(p[:, 1], 2.0)))
    assert on.all()


@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_renders_with_occlusion_and_bg(name):
    prims = SCENES[name]()
    views = sphere_cameras(4, radius=2.4, focal=110.0, wh=(100, 100), seed=1)
    campos, rot, K = views[0]
    item = view_item(prims, campos, rot, K, (100, 100), view_id=0)
    gt = item["gt_image"].reshape(100, 100, 3)
    assert np.isfinite(gt).all() and gt.min() >= 0 and gt.max() <= 1
    bg_frac = np.isclose(gt, BG).all(-1).mean()
    # object occupies part of the frame, background the rest
    assert 0.05 < bg_frac < 0.95, bg_frac
    # different viewpoints give different images (occlusion/specular change)
    item2 = view_item(prims, *views[2], (100, 100), view_id=2)
    assert np.abs(gt - item2["gt_image"].reshape(100, 100, 3)).max() > 0.1


def test_cloud_matches_render_geometry():
    """Every sampled cloud point must lie on SOME primitive surface: casting
    a ray from the camera through the point must hit at (or before) the
    point's distance."""
    prims = SCENES["cluster"]()
    xyz, color, normals = sample_cloud(prims, 2000, seed=3)
    assert xyz.shape == (2000, 3) and color.shape == (2000, 3)
    assert np.isfinite(xyz).all()
    assert color.min() >= 0 and color.max() <= 1
    nn = np.linalg.norm(normals, axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)
    campos = np.array([0.0, 0.1, -2.4], np.float32)
    d = xyz - campos[None]
    dist = np.linalg.norm(d, axis=-1)
    col = gt_render(prims, campos, d)
    # rays toward surface points must hit something (not background)
    hit_frac = (~np.isclose(col, BG).all(-1)).mean()
    assert hit_frac > 0.99, hit_frac


def test_specular_is_view_dependent():
    prims = [Sphere((0, 0, 0), 0.5,
                    Material("solid", 1.0, (0.3, 0.3, 0.3), (0, 0, 0),
                             specular=0.9, shininess=32.0))]
    # two cameras on opposite sides; highlight only where reflection aligns
    c1 = np.array([0.8, 0.8, -1.8], np.float32)
    c2 = np.array([-0.8, -0.8, 1.8], np.float32)
    d1 = -c1 / np.linalg.norm(c1)
    d2 = -c2 / np.linalg.norm(c2)
    g1 = gt_render(prims, c1, d1[None])
    g2 = gt_render(prims, c2, d2[None])
    assert np.abs(g1 - g2).max() > 0.2, (g1, g2)
