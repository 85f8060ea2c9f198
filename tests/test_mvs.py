"""MVS stack: homography warp, depth regression, geometric consistency,
and the end-to-end point-initialization pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.mvs.mvsnet import (MVSNet, depth_regression, homo_warp)
from pointnerf_tpu.mvs.filter import (check_geometric_consistency,
                                      filter_by_masks)
from pointnerf_tpu.mvs.points_init import (MvsPointsInit, gen_scene_points,
                                           init_mvs_points, view_proj_mats)


def test_homo_warp_identity():
    """Warping a view into itself (proj = I) returns the view at every depth."""
    rng = np.random.RandomState(0)
    feat = rng.rand(16, 20, 4).astype(np.float32)
    depths = jnp.asarray([1.0, 2.0, 5.0])
    out = homo_warp(jnp.asarray(feat), jnp.eye(4), depths)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(out[d]), feat, atol=1e-5)


def test_depth_regression_peak():
    D, H, W = 8, 4, 4
    prob = np.zeros((D, H, W), np.float32)
    prob[3] = 1.0
    dv = jnp.linspace(1.0, 8.0, D)
    d = depth_regression(jnp.asarray(prob), dv)
    np.testing.assert_allclose(np.asarray(d), np.full((H, W), float(dv[3])),
                               rtol=1e-6)


def _two_cams(H=24, W=32, baseline=0.2):
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    E0 = np.eye(4, dtype=np.float32)
    E1 = np.eye(4, dtype=np.float32)
    E1[0, 3] = -baseline  # camera shifted +x in world
    return K, E0, E1


def test_geometric_consistency_perfect_plane():
    """A fronto-parallel plane at z=4 seen by two cameras is consistent."""
    H, W = 24, 32
    K, E0, E1 = _two_cams(H, W)
    d0 = np.full((H, W), 4.0, np.float32)
    d1 = np.full((H, W), 4.0, np.float32)
    geo, vis, d_rep = check_geometric_consistency(
        jnp.asarray(d0), jnp.asarray(K), jnp.asarray(E0),
        jnp.asarray(d1), jnp.asarray(K), jnp.asarray(E1))
    geo = np.asarray(geo)
    # interior pixels that reproject inside both frusta must pass
    assert geo[4:-4, 8:-8].all()
    # corrupt the src depth -> consistency must break
    geo2, _, _ = check_geometric_consistency(
        jnp.asarray(d0), jnp.asarray(K), jnp.asarray(E0),
        jnp.asarray(d1 * 1.5), jnp.asarray(K), jnp.asarray(E1))
    assert not np.asarray(geo2)[4:-4, 8:-8].any()


def test_filter_by_masks_keeps_consistent_points():
    H, W = 24, 32
    K, E0, E1 = _two_cams(H, W)
    depths = [np.full((H, W), 4.0, np.float32)] * 2
    confs = [np.full((H, W), 0.9, np.float32)] * 2
    xyz, conf = filter_by_masks(depths, confs, [K, K], [E0, E1],
                                depth_conf_thresh=0.5, geo_cnsst_num=1)
    assert len(xyz) == 2
    assert xyz[0].shape[0] > 0
    # all surviving points lie on the z=4 plane in world coords
    np.testing.assert_allclose(xyz[0][:, 2], 4.0, atol=1e-3)


def test_mvsnet_forward_shapes():
    model = MVSNet()
    V, H, W, D = 3, 32, 32, 16
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(V, H, W, 3), jnp.float32)
    projs = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * V))
    dv = jnp.linspace(2.0, 6.0, D)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv)
    depth, conf, feats, prob = model.apply(variables, imgs, projs, dv)
    assert depth.shape == (H // 4, W // 4)
    assert conf.shape == (H // 4, W // 4)
    assert feats.shape == (V, H // 4, W // 4, 32)
    assert prob.shape == (D, H // 4, W // 4)
    assert np.isfinite(np.asarray(depth)).all()
    assert float(jnp.min(conf)) >= 0 and float(jnp.max(conf)) <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(jnp.sum(prob, 0)), 1.0, atol=1e-4)


def test_gen_scene_points_end_to_end():
    """Untrained net on random-ish views: pipeline produces well-formed
    payloads (geometry quality needs training; this checks plumbing)."""
    V, H, W = 3, 32, 32
    rng = np.random.RandomState(0)
    images = rng.rand(V, H, W, 3).astype(np.float32)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    Ks = np.stack([K] * V)
    w2cs = np.stack([np.eye(4, dtype=np.float32)] * V)
    for v in range(V):
        w2cs[v][0, 3] = -0.1 * v
    model = MvsPointsInit(point_features_dim=8)
    variables = init_mvs_points(model, jax.random.PRNGKey(0), V=V, H=H, W=W)
    out = gen_scene_points(variables["params"], model, images, Ks, w2cs,
                           (2.0, 6.0), n_depths=8, depth_conf_thresh=0.0,
                           geo_cnsst_num=1,
                           batch_stats=variables.get("batch_stats"))
    n = out["xyz"].shape[0]
    assert out["embedding"].shape == (n, 8)
    assert out["color"].shape == (n, 3)
    assert out["dirs"].shape == (n, 3)
    assert out["conf"].shape == (n, 1)
    for v in out.values():
        assert np.isfinite(v).all()


def test_trilinear_volume_sampling():
    from pointnerf_tpu.mvs.mvsnerf import trilinear_sample_volume
    vol = np.zeros((4, 4, 4, 2), np.float32)
    vol[2, 1, 3] = [5.0, -1.0]
    # exact grid point
    ndc = jnp.asarray([[3 / 3, 1 / 3, 2 / 3]])
    out = np.asarray(trilinear_sample_volume(jnp.asarray(vol), ndc))
    np.testing.assert_allclose(out[0], [5.0, -1.0], atol=1e-6)
    # midpoint between two cells interpolates
    vol2 = np.zeros((2, 1, 1, 1), np.float32)
    vol2[0, 0, 0] = 2.0
    vol2[1, 0, 0] = 4.0
    out2 = trilinear_sample_volume(jnp.asarray(vol2),
                                   jnp.asarray([[0.0, 0.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(out2)[0], [3.0], atol=1e-6)


def test_render_mvsnerf_end_to_end():
    import jax
    from pointnerf_tpu.mvs.mvsnerf import MVSNeRFDecoder, render_mvsnerf
    rng = np.random.RandomState(0)
    V, H, W = 2, 16, 16
    D, h, w, C = 8, 4, 4, 8
    volume = jnp.asarray(rng.rand(D, h, w, C), jnp.float32)
    images = jnp.asarray(rng.rand(V, H, W, 3), jnp.float32)
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    Ks = jnp.asarray(np.stack([K] * V))
    w2cs = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * V))
    dec = MVSNeRFDecoder(width=32, depth=3, skips=(2,))
    campos = jnp.zeros(3)
    raydir = jnp.asarray(rng.rand(10, 3).astype(np.float32) * 0.2
                         + np.array([0, 0, 1.0], np.float32))
    feat_dim = C + 3 * V
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)),
                      jnp.zeros((1, 3)), jnp.zeros((1, feat_dim)))["params"]
    rgb, depth, weights = render_mvsnerf(
        params, dec, volume, images, Ks, w2cs, campos, raydir,
        near=2.0, far=6.0, n_samples=16, bg_color=jnp.ones(3))
    assert rgb.shape == (10, 3)
    assert depth.shape == (10,)
    assert np.isfinite(np.asarray(rgb)).all()
