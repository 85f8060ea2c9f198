"""End-to-end driver loop, prune/grow, metrics, checkpoint, and data IO."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.data.ply import load_ply, save_ply
from pointnerf_tpu.data.synthetic import sphere_gt_render, sphere_scene
from pointnerf_tpu.ops.voxel import construct_vox_points_closest
from pointnerf_tpu.utils.metrics import psnr, rmse, ssim


def test_driver_demo_end_to_end(tmp_path):
    """The full per-scene loop: train + prune + grow probe + eval +
    checkpoint + resume."""
    from pointnerf_tpu.train.driver import demo
    hist = demo(steps=60, n_pts=1024, wh=(48, 48),
                run_dir=str(tmp_path / "run"))
    assert hist["eval"], "no eval happened"
    assert np.isfinite(hist["eval"][-1]["psnr"])
    # checkpoint written
    cks = [d for d in os.listdir(tmp_path / "run") if d.startswith("ckpt_")]
    assert cks, "no checkpoint saved"


def test_checkpoint_roundtrip(tmp_path):
    from pointnerf_tpu.config import tiny_test_config
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.checkpoint import (latest_checkpoint,
                                                load_checkpoint,
                                                save_checkpoint)
    from pointnerf_tpu.train.step import create_train_state
    cfg = tiny_test_config()
    xyz, color, normals = sphere_scene(n_pts=256)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim)
    state = create_train_state(k3, init_aggregator_params(k2, cfg.agg), pc, cfg)
    save_checkpoint(str(tmp_path), state, {"num_active": int(st.num_active)})
    path = latest_checkpoint(str(tmp_path))
    assert path is not None
    restored, meta = load_checkpoint(path, state)
    assert meta["num_active"] == int(st.num_active)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prune_permutes_and_grow_appends():
    from pointnerf_tpu.config import tiny_test_config
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.grow import ProbeCandidates, apply_grow, apply_prune
    from pointnerf_tpu.train.step import create_train_state
    cfg = tiny_test_config()
    xyz, color, normals = sphere_scene(n_pts=100)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim)
    conf = pc.conf.at[:50, 0].set(0.01)  # half below default thresh 0.1
    pc = pc._replace(conf=conf)
    state = create_train_state(k3, init_aggregator_params(k2, cfg.agg), pc, cfg)
    state, st, kept = apply_prune(state, st, cfg)
    assert kept == 50
    assert int(st.num_active) == 50

    F = cfg.agg.point_features_dim
    cand = ProbeCandidates(
        xyz=np.zeros((7, 3), np.float32),
        embedding=np.ones((7, F), np.float32),
        color=np.ones((7, 3), np.float32) * 0.5,
        dirs=np.zeros((7, 3), np.float32),
        conf=np.full((7, 1), 0.3, np.float32))
    state, st, added = apply_grow(state, st, cand, cfg)
    assert added == 7
    assert int(st.num_active) == 57
    feats = np.asarray(state.params["points"].features)
    assert np.allclose(feats[50:57], 1.0)


def test_metrics_sanity():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    assert psnr(img, img) > 90
    assert abs(ssim(img, img) - 1.0) < 1e-9
    assert rmse(img, img) == 0.0
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    p = psnr(noisy, img)
    assert 15 < p < 25
    assert 0 < ssim(noisy, img) < 1
    # skimage cross-check when available
    try:
        from skimage.metrics import structural_similarity
        ref = structural_similarity(noisy, img, win_size=11, channel_axis=-1,
                                    data_range=1.0)
        assert abs(ssim(noisy, img) - ref) < 1e-3
    except ImportError:
        pass


def test_ply_roundtrip(tmp_path):
    xyz = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    color = np.random.RandomState(1).rand(50, 3).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    save_ply(p, xyz, color)
    back = load_ply(p)
    np.testing.assert_allclose(back["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(back["color"], np.clip(color, 0, 1), atol=1 / 255.0 + 1e-6)


def test_voxel_downsample():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    idx, centroids = construct_vox_points_closest(xyz, vox_res=4)
    assert len(idx) == len(centroids)
    assert len(np.unique(idx)) == len(idx)
    # each representative is the closest point to its centroid
    from pointnerf_tpu.ops.voxel import voxelize_ids
    vid = np.asarray(voxelize_ids(jnp.asarray(xyz), 4)[0])
    for j in range(min(10, len(idx))):
        c = centroids[j]
        seg = vid == vid[idx[j]]
        d = np.sum((xyz[seg] - c) ** 2, axis=-1)
        assert np.isclose(np.sum((xyz[idx[j]] - c) ** 2), d.min())


def test_synthetic_gt_hits_sphere():
    from pointnerf_tpu.data.synthetic import ring_cameras, view_ray_batch
    campos, rot, K = ring_cameras(n_views=1, wh=(32, 32), focal=40.0)[0]
    item = view_ray_batch(campos, rot, K, (32, 32))
    gt = item["gt_image"]
    bg = np.all(gt == 1.0, axis=-1)
    assert 0 < bg.sum() < gt.shape[0], "render should mix sphere and bg"


def test_eval_cli(tmp_path):
    """run/evaluate.py equivalent: folder-vs-folder metric scoring."""
    import subprocess, sys
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    for d in ("pred", "gt"):
        os.makedirs(tmp_path / d, exist_ok=True)
    for i in range(3):
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        imageio.imwrite(str(tmp_path / "gt" / f"{i}.png"), img)
        noisy = np.clip(img.astype(int) + rng.randint(-20, 20, img.shape),
                        0, 255).astype(np.uint8)
        imageio.imwrite(str(tmp_path / "pred" / f"{i}.png"), noisy)
    r = subprocess.run(
        [sys.executable, "-m", "pointnerf_tpu.eval_cli",
         "--pred", str(tmp_path / "pred"), "--gt", str(tmp_path / "gt"),
         "--metrics", "psnr", "ssim", "rmse"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    scores = (tmp_path / "pred" / "scores.txt").read_text()
    assert "psnr:" in scores and "ssim:" in scores


def test_scene_presets():
    """Per-scene preset suite (VERDICT r1 #7): every dev_scripts scene has a
    typed config that JSON round-trips and carries its script's values."""
    from pointnerf_tpu.config import PointNeRFConfig
    from pointnerf_tpu.presets import (SCENE_PRESETS, preset_mvs_init_kwargs,
                                       scene_preset)
    assert len(SCENE_PRESETS) == 15  # 8 n360 + 2 scannet + 5 tt
    for name in SCENE_PRESETS:
        cfg = scene_preset(name)
        assert PointNeRFConfig.from_json(cfg.to_json()) == cfg
        kw = preset_mvs_init_kwargs(name)
        assert 0.0 <= kw["depth_conf_thresh"] <= 1.0
    chair = scene_preset("nerf_synth/chair")
    assert chair.query.max_o == 410000 and chair.query.P == 12
    assert chair.train.prune_iter == -10001  # chair never prunes
    truck = scene_preset("tt/truck")
    assert truck.query.vsize == (0.002, 0.002, 0.002)
    assert truck.data.img_wh == (1088, 640)
    assert truck.points.default_conf == 0.1
    mic = scene_preset("nerf_synth/mic")
    assert mic.train.random_sample_size == 110
    assert mic.train.prob_freq == -10001     # mic never grows


def test_checkpoint_legacy_restore_without_hits(tmp_path):
    """Checkpoints written before TrainState.hits restore with fresh zero
    counters instead of failing (round-2 artifacts stay resumable)."""
    from pointnerf_tpu.config import tiny_test_config
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.checkpoint import (latest_checkpoint,
                                                load_checkpoint,
                                                save_checkpoint)
    from pointnerf_tpu.train.step import create_train_state
    cfg = tiny_test_config()
    xyz, _, _ = sphere_scene(n_pts=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim)
    state = create_train_state(k3, init_aggregator_params(k2, cfg.agg), pc,
                               cfg)
    legacy = state._replace(hits=None)  # pre-hits on-disk layout
    save_checkpoint(str(tmp_path), legacy, {"num_active": int(st.num_active)})
    restored, _ = load_checkpoint(latest_checkpoint(str(tmp_path)), state)
    assert restored.hits is not None
    assert float(jnp.sum(restored.hits)) == 0.0
    np.testing.assert_array_equal(np.asarray(restored.params["points"].xyz),
                                  np.asarray(pc.xyz))
