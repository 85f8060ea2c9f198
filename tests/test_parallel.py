"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Checks the point-sharded + ray-data-parallel path (parallel/sharded.py)
against the single-device reference path for exact forward parity and for
training progress. Mirrors the driver's dryrun_multichip contract.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.points import make_point_cloud
from pointnerf_tpu.models.renderer import RayBatch
from pointnerf_tpu.parallel import (build_sharded_scene,
                                    create_sharded_train_state,
                                    make_sharded_eval_step,
                                    make_sharded_train_step, make_mesh,
                                    partition_points)
from pointnerf_tpu.train.step import eval_step, refresh_grid

from test_render import make_batch, synthetic_scene


def sharded_cfg():
    cfg = tiny_test_config()
    # shell_layered off for exact KNN parity between sharded/unsharded
    # (see parallel/sharded.py module docstring); P large enough that
    # per-voxel bucket caps never truncate in this scene.
    return cfg.replace(query=dataclasses.replace(
        cfg.query, shell_layered=False, P=128))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_eval_matches_unsharded():
    cfg = sharded_cfg()
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    # single-device reference
    pc1, st1 = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                                capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    grid1 = refresh_grid(pc1, st1, cfg)
    batch = make_batch(campos, camrot, R=64)
    ref = eval_step({"mlp": params, "points": pc1}, st1, grid1, batch, cfg)

    # sharded: same cloud partitioned over mp=2, rays over dp=4.
    # partition_points must use the same per-point features as the reference
    # cloud, so carry them over explicitly.
    mesh = make_mesh(dp=4, mp=2)
    feats = np.asarray(pc1.features[:400])
    colors = np.asarray(pc1.color[:400])
    dirs = np.asarray(pc1.dirs[:400])
    conf = np.asarray(pc1.conf[:400])
    pc_s, num_active = partition_points(xyz, k1, cfg, mp=2, features=feats,
                                        color=colors, dirs=dirs, conf=conf)
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(9), params, pc_s, scene, cfg, mesh)
    ev = make_sharded_eval_step(cfg, mesh)
    out = ev(state.params, scene, batch)

    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.coarse_point_opacity),
                               np.asarray(ref.coarse_point_opacity),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_prebuilt_neighbors_parity():
    """With cfg.query.prebuild_neighbors=True the ShardedScene carries
    per-shard neighbor tables and the sharded render must still match the
    single-device path exactly (each shard's table covers its own dilated
    occupancy; missing voxels correctly yield no local candidates and the
    all_to_all merge reproduces the global KNN)."""
    cfg = sharded_cfg()
    cfg = cfg.replace(query=dataclasses.replace(
        cfg.query, prebuild_neighbors=True))
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    pc1, st1 = make_point_cloud(xyz, k1, cfg.points,
                                cfg.agg.point_features_dim, capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    grid1 = refresh_grid(pc1, st1, cfg)
    batch = make_batch(campos, camrot, R=64)
    ref = eval_step({"mlp": params, "points": pc1}, st1, grid1, batch, cfg)

    mesh = make_mesh(dp=4, mp=2)
    pc_s, num_active = partition_points(
        xyz, k1, cfg, mp=2, features=np.asarray(pc1.features[:400]),
        color=np.asarray(pc1.color[:400]), dirs=np.asarray(pc1.dirs[:400]),
        conf=np.asarray(pc1.conf[:400]))
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    assert scene.vox_dslot is not None and scene.nbr_xyz is not None
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(9), params, pc_s, scene, cfg, mesh)
    out = make_sharded_eval_step(cfg, mesh)(state.params, scene, batch)
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=2e-4, atol=2e-4)

    # and the training step runs + learns through the prebuilt path
    step = make_sharded_train_step(cfg, mesh)
    losses = []
    for _ in range(10):
        state, items = step(state, scene, batch)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_training_reduces_loss():
    cfg = sharded_cfg()
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    mesh = make_mesh(dp=4, mp=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pc_s, num_active = partition_points(xyz, k1, cfg, mp=2)
    params = init_aggregator_params(k2, cfg.agg)
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(3), params, pc_s, scene, cfg, mesh)
    step = make_sharded_train_step(cfg, mesh)
    batch = make_batch(campos, camrot, R=64)
    losses = []
    for _ in range(30):
        state, items = step(state, scene, batch)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_only_mesh():
    """mp=1 degenerates to pure ray data-parallelism."""
    cfg = sharded_cfg()
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    mesh = make_mesh(dp=8, mp=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pc_s, num_active = partition_points(xyz, k1, cfg, mp=1)
    params = init_aggregator_params(k2, cfg.agg)
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(3), params, pc_s, scene, cfg, mesh)
    step = make_sharded_train_step(cfg, mesh)
    batch = make_batch(campos, camrot, R=64)
    state, items = step(state, scene, batch)
    assert np.isfinite(float(items["loss_total"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_prune_and_grow():
    cfg = sharded_cfg()
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    mesh = make_mesh(dp=4, mp=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pc_s, num_active = partition_points(xyz, k1, cfg, mp=2)
    # half the points below the prune threshold
    conf = pc_s.conf
    conf = conf.at[:, :100, 0].set(0.01)
    pc_s = pc_s._replace(conf=conf)
    params = init_aggregator_params(k2, cfg.agg)
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(3), params, pc_s, scene, cfg, mesh)

    from pointnerf_tpu.parallel.sharded import sharded_grow, sharded_prune
    from pointnerf_tpu.train.grow import ProbeCandidates
    state, scene, kept = sharded_prune(state, scene, cfg, mesh)
    assert kept == 200
    assert int(jnp.sum(scene.num_active)) == 200

    F = cfg.agg.point_features_dim
    cand = ProbeCandidates(
        xyz=np.zeros((10, 3), np.float32),
        embedding=np.ones((10, F), np.float32),
        color=np.full((10, 3), 0.5, np.float32),
        dirs=np.zeros((10, 3), np.float32),
        conf=np.full((10, 1), 0.3, np.float32))
    state, scene, added = sharded_grow(state, scene, cand, cfg, mesh)
    assert added == 10
    assert int(jnp.sum(scene.num_active)) == 210
    # training still works after maintenance
    step = make_sharded_train_step(cfg, mesh)
    batch = make_batch(campos, camrot, R=64)
    state, items = step(state, scene, batch)
    assert np.isfinite(float(items["loss_total"]))


def test_multihost_helpers_single_process():
    from pointnerf_tpu.parallel import multihost
    # single process, no coordinator: no-op
    assert multihost.initialize() is False
    s = multihost.host_batch_slice(3600)
    assert (s.stop - s.start) == 3600 // jax.process_count()
    mesh = make_mesh(dp=min(8, len(jax.devices())), mp=1)
    arrs = multihost.global_ray_batch(mesh, {"x": np.ones((3600, 3))})
    assert arrs["x"].shape == (3600, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_driver_loop(tmp_path):
    """Full sharded per-scene loop: train + per-shard prune + eval on the
    virtual mesh (the multi-chip train_scene analog)."""
    import dataclasses as dc
    from pointnerf_tpu.data.synthetic import (ring_cameras, sphere_scene,
                                              view_ray_batch)
    from pointnerf_tpu.train.driver import train_scene_sharded

    cfg = sharded_cfg()
    cfg = cfg.replace(train=dc.replace(
        cfg.train, maximum_step=40, prune_iter=20, prune_max_iter=40,
        prune_thresh=0.05, prob_freq=0, test_freq=20, print_freq=10,
        save_iter_freq=0))
    mesh = make_mesh(dp=4, mp=2)
    xyz, color, normals = sphere_scene(n_pts=512)
    views = ring_cameras(n_views=3, wh=(32, 32), focal=40.0)

    def train_item(step):
        return view_ray_batch(*views[step % 2], (32, 32), n_rays=64,
                              seed=step)

    test_items = [view_ray_batch(*views[2], (32, 32), n_rays=64, seed=999)]
    state, scene, hist = train_scene_sharded(
        cfg, mesh, (xyz, color, normals), train_item, test_items, (32, 32),
        run_dir=str(tmp_path / "shrun"), max_steps=40)
    assert int(state.step) == 40
    assert hist["eval"] and np.isfinite(hist["eval"][-1]["psnr"])
    assert int(jnp.sum(scene.num_active)) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_probe_grow_loop(tmp_path):
    """Sharded loop with probe-hole growing: a hole-punched shell must gain
    points at the probe step."""
    import dataclasses as dc
    from pointnerf_tpu.data.synthetic import (ring_cameras, sphere_scene,
                                              view_ray_batch)
    from pointnerf_tpu.train.driver import train_scene_sharded

    cfg = sharded_cfg()
    cfg = cfg.replace(train=dc.replace(
        cfg.train, maximum_step=30, prune_iter=0, prob_freq=25,
        prob_thresh=0.0, prob_mul=0.4, test_freq=0, print_freq=10))
    mesh = make_mesh(dp=4, mp=2)
    xyz, color, normals = sphere_scene(n_pts=800, radius=0.5)
    keep = xyz[:, 0] < 0.1
    xyz, color, normals = xyz[keep], color[keep], normals[keep]
    views = ring_cameras(n_views=4, wh=(32, 32), focal=40.0)

    def train_item(step):
        return view_ray_batch(*views[step % len(views)], (32, 32), n_rays=64,
                              seed=step, view_id=step % len(views))

    probe_items = [view_ray_batch(*views[i], (32, 32), view_id=i)
                   for i in range(len(views))]
    n0 = int(keep.sum())
    state, scene, hist = train_scene_sharded(
        cfg, mesh, (xyz, color, normals), train_item, [], (32, 32),
        run_dir=str(tmp_path / "gr"), max_steps=30, probe_items=probe_items)
    assert int(jnp.sum(scene.num_active)) > n0, "probe/grow added no points"
