"""Waymo TFRecord -> npz export pipeline + multiseq-onto-mp partition.

`frames_to_npz` is the pure-numpy half of the exporter (the TF/waymo-od
reader is import-gated and exercised where the raw data lives); these tests
prove the bundle it writes matches what data/waymo.WaymoDataset (and the
reference waymo_ft_dataset.py:116-139 layout) consumes, including the
reference's pose remap and split conventions (load_waymo.py:284-300).

VERDICT r2 next #7.
"""
import dataclasses

import numpy as np
import jax
import pytest

from pointnerf_tpu.config import DataConfig, tiny_test_config
from pointnerf_tpu.data import find_dataset_class_by_name
from pointnerf_tpu.data.waymo_export import (_remap_pose, _resize_area,
                                             frames_to_npz)


def _look_rot(i):
    a = 0.1 * i
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _frames(n=12, H=80, W=120, with_points=True):
    rng = np.random.RandomState(0)
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)
    frames = []
    for i in range(n):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = _look_rot(i)
        c2w[:3, 3] = [i * 0.5, 0.0, 0.0]
        pts = (rng.randn(500, 3).astype(np.float32) + [i * 0.5, 0, 3]
               if with_points and i % 10 != 0 else None)
        frames.append({"image": rng.rand(H, W, 3).astype(np.float32),
                       "c2w": c2w, "K": K, "points_world": pts})
    return frames, K


def test_bundle_layout_and_loader_roundtrip(tmp_path):
    frames, K = _frames()
    path = str(tmp_path / "seq0.npz")
    bundle = frames_to_npz(frames, path, step=10, scale_factor=4.0,
                           vox_res=32)
    # pose remap matches the reference formula (load_waymo.py:284)
    c2w = frames[3]["c2w"]
    want = np.concatenate([-c2w[:, 1:2], c2w[:, 2:3], -c2w[:, 0:1],
                           c2w[:, 3:4]], 1)
    np.testing.assert_allclose(bundle["poses"][3], want, rtol=1e-6)
    # camera position survives the remap untouched
    np.testing.assert_array_equal(bundle["poses"][:, :3, 3],
                                  np.stack([f["c2w"][:3, 3] for f in frames]))
    # image at 2x the pose scale (:294-300): 80x120 / 4 * 2 = 40x60
    assert bundle["images"].shape == (12, 40, 60, 3)
    # bundle intrinsic matches the image resolution
    assert bundle["intrinsic"][0, 0] == pytest.approx(K[0, 0] / 4 * 2)
    assert bundle["hwf"][0] == 40 and bundle["hwf"][1] == 60
    # LiDAR: voxel-downsampled union of the non-test frames
    assert bundle["points_xyz_all"].ndim == 2
    assert 0 < len(bundle["points_xyz_all"]) < 500 * 11
    # split convention: every 10th frame is test
    np.testing.assert_array_equal(bundle["test_ids"], [0, 10])

    # the waymo_ft loader consumes the bundle directly
    cfg = DataConfig(dataset_name="waymo_ft", data_root=str(tmp_path),
                     scan="seq0")
    ds = find_dataset_class_by_name("waymo_ft")(cfg, split="train")
    assert len(ds) == 10  # 12 frames minus test [0, 10]
    item = ds.get_item(0, random_sample_size=4, seed=0)
    assert item["raydir"].shape == (16, 3)
    assert np.all(np.isfinite(item["gt_image"]))
    cloud = ds.load_init_points()
    np.testing.assert_array_equal(cloud["xyz"], bundle["points_xyz_all"])

    # center-pixel dirs recomputed through the loader's own convention
    # match the exporter's centerdirs (same K-scaling, pre-remap rotation)
    from pointnerf_tpu.camera import get_dtu_raydir
    for i in (1, 5):
        want = get_dtu_raydir(
            np.asarray([[60 // 2, 40 // 2]], np.float32) * 1.0,
            bundle["intrinsic"], frames[i]["c2w"][:3, :3], True)
        got = bundle["centerdirs"][i]
        # same normalized direction up to the half-pixel center offset
        # (the reference evaluates centerdirs at the POSE-scale wh//2,
        # load_waymo.py:185,257 — the +0.5 pixel-center term scales
        # differently at the two resolutions)
        assert float(np.dot(want[0], got)) > 0.999


def test_resize_area_box_mean_exact():
    img = np.arange(4 * 6 * 1, dtype=np.float32).reshape(4, 6, 1)
    out = _resize_area(img, 2, 3)
    want = img.reshape(2, 2, 3, 2, 1).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-6)
    # non-integer path stays finite and in-range
    out2 = _resize_area(img, 3, 4)
    assert out2.shape == (3, 4, 1)
    assert out2.min() >= img.min() and out2.max() <= img.max()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multiseq_two_sequences_onto_mp_end_to_end(tmp_path):
    """Two exported sequences -> load_multiseq -> partition onto mp=2 ->
    sharded training steps run and the union render sees BOTH sequences'
    geometry (the fork's per-sequence DDP clouds, train_ddp.py:720-740)."""
    from pointnerf_tpu.data.waymo import load_multiseq
    from pointnerf_tpu.parallel import (build_sharded_scene,
                                        create_sharded_train_state,
                                        make_mesh, make_sharded_train_step)
    from pointnerf_tpu.parallel.sharded import partition_points_multiseq
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from test_parallel import sharded_cfg

    for s in range(2):
        frames, _ = _frames(n=8)
        # separate the sequences spatially so shard ownership is testable
        for f in frames:
            f["c2w"] = f["c2w"].copy()
            f["c2w"][:3, 3] += [0, 0, 6.0 * s]
            if f["points_world"] is not None:
                f["points_world"] = f["points_world"] + [0, 0, 6.0 * s]
        frames_to_npz(frames, str(tmp_path / f"seq{s}.npz"), vox_res=24)

    dcfg = DataConfig(dataset_name="waymo_ft", data_root=str(tmp_path),
                      scan="seq0")
    seqs = load_multiseq(dcfg, ["seq0", "seq1"])
    clouds = [ds.load_init_points() for ds in seqs]

    cfg = sharded_cfg()
    # scene AABB covering both sequences
    allp = np.concatenate([c["xyz"] for c in clouds])
    from pointnerf_tpu.config import ranges_from_cloud
    cfg = cfg.replace(query=dataclasses.replace(
        cfg.query, ranges=ranges_from_cloud(allp),
        vsize=(0.5, 0.5, 0.5)),
        render=dataclasses.replace(cfg.render, near_plane=0.5,
                                   far_plane=12.0))

    mesh = make_mesh(dp=4, mp=2)
    pc_s, num_active, shard_seq = partition_points_multiseq(
        clouds, jax.random.PRNGKey(0), cfg, mp=2)
    # one sequence per shard; every shard owned, counts match the clouds
    assert sorted(shard_seq.tolist()) == [0, 1]
    for s in range(2):
        assert int(num_active[s]) == clouds[shard_seq[s]]["xyz"].shape[0]
        got = np.asarray(pc_s.xyz)[s, : int(num_active[s])]
        assert np.isin(got[:, 2].round(4),
                       clouds[shard_seq[s]]["xyz"][:, 2].round(4)).all()

    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(2), params, pc_s, scene, cfg, mesh)
    step = make_sharded_train_step(cfg, mesh)

    from pointnerf_tpu.train.driver import _to_batch
    item = seqs[0].get_item(0, random_sample_size=4, seed=1)
    item["near"], item["far"] = 0.5, 12.0
    batch = _to_batch(item, cfg)
    for i in range(2):
        state, items = step(state, scene, batch)
    assert np.isfinite(float(items["loss_total"]))


def test_multiseq_more_shards_than_sequences():
    from pointnerf_tpu.parallel.sharded import partition_points_multiseq
    cfg = tiny_test_config()
    rng = np.random.RandomState(0)
    clouds = [{"xyz": rng.randn(300, 3).astype(np.float32)},
              {"xyz": rng.randn(100, 3).astype(np.float32)}]
    pc, num_active, shard_seq = partition_points_multiseq(
        clouds, jax.random.PRNGKey(0), cfg, mp=4)
    assert int(num_active.sum()) == 400
    # big sequence gets more shards; every sequence keeps at least one
    assert (shard_seq == 0).sum() == 3 and (shard_seq == 1).sum() == 1
    # sequences to shards is a partition: per-shard points come from the
    # owning sequence only
    for s in range(4):
        pts = np.asarray(pc.xyz)[s, : int(num_active[s])]
        src = clouds[shard_seq[s]]["xyz"]
        assert np.isin(pts.round(5), src.round(5)).all()

    # mp < n_seq: concatenation, everything lands somewhere
    clouds3 = clouds + [{"xyz": rng.randn(50, 3).astype(np.float32)}]
    pc2, na2, ss2 = partition_points_multiseq(
        clouds3, jax.random.PRNGKey(0), cfg, mp=2)
    assert int(na2.sum()) == 450
    assert ss2[0] == -1  # shard 0 holds sequences 0 and 2 (mixed)
    assert ss2[1] == 1
