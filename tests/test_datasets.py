"""Dataset loaders against generated on-disk fixtures (no real data in this
environment; the fixtures replicate each format's layout)."""
import json
import os

import numpy as np
import pytest

from pointnerf_tpu.config import DataConfig
from pointnerf_tpu.data import find_dataset_class_by_name


def _write_png(path, arr):
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, arr)


def _rand_img(rng, h=16, w=20, alpha=False):
    c = 4 if alpha else 3
    return (rng.rand(h, w, c) * 255).astype(np.uint8)


def test_nerf_synth_dataset(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "lego"
    frames = []
    for i in range(3):
        _write_png(str(root / "train" / f"r_{i}.png"), _rand_img(rng, alpha=True))
        pose = np.eye(4)
        pose[2, 3] = 4.0 + i
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": pose.tolist()})
    (root / "transforms_train.json").write_text(json.dumps(
        {"camera_angle_x": 0.69, "frames": frames}))
    cfg = DataConfig(dataset_name="nerf_synth360_ft", data_root=str(tmp_path),
                     scan="lego", img_wh=(20, 16))
    ds = find_dataset_class_by_name("nerf_synth360_ft")(cfg, split="train")
    assert len(ds) == 3
    item = ds.get_item(0, random_sample="random", random_sample_size=4)
    assert item["raydir"].shape == (16, 3)
    assert item["gt_image"].shape == (16, 3)
    full = ds.get_item(1)  # no_crop
    assert full["raydir"].shape == (16 * 20, 3)
    spiral = ds.get_dummyrot_item(3)
    assert spiral["raydir"].shape == (16 * 20, 3)


def test_nsvf_dataset(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "Barn"
    for i in range(2):
        _write_png(str(root / "rgb" / f"0_{i:04d}.png"), _rand_img(rng))
        pose = np.eye(4)
        pose[2, 3] = -3.0
        os.makedirs(root / "pose", exist_ok=True)
        np.savetxt(str(root / "pose" / f"0_{i:04d}.txt"), pose)
    np.savetxt(str(root / "intrinsics.txt"),
               np.array([[30.0, 10.0, 8.0, 0.0]]))
    np.savetxt(str(root / "bbox.txt"),
               np.array([[-1, -1, -1, 1, 1, 1, 0.01]]))
    cfg = DataConfig(dataset_name="tt_ft", data_root=str(tmp_path),
                     scan="Barn")
    ds = find_dataset_class_by_name("tt_ft")(cfg, split="train")
    assert len(ds) == 2
    assert ds.bbox.shape == (6,)
    item = ds.get_item(0, random_sample="random", random_sample_size=3)
    assert item["raydir"].shape == (9, 3)
    assert np.isfinite(item["near"]) and item["far"] > item["near"]


def test_scannet_dataset(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "scene0101_04"
    for i in range(6):
        _write_png(str(root / "color" / f"{i}.jpg"), _rand_img(rng))
        depth = (rng.rand(16, 20) * 3000).astype(np.uint16)
        _write_png(str(root / "depth" / f"{i}.png"), depth)
        os.makedirs(root / "pose", exist_ok=True)
        np.savetxt(str(root / "pose" / f"{i}.txt"), np.eye(4))
    os.makedirs(root / "intrinsic", exist_ok=True)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 25.0
    K[0, 2], K[1, 2] = 10, 8
    np.savetxt(str(root / "intrinsic" / "intrinsic_color.txt"), K)
    cfg = DataConfig(dataset_name="scannet_ft", data_root=str(tmp_path),
                     scan="scene0101_04")
    ds = find_dataset_class_by_name("scannet_ft")(cfg, split="train")
    assert len(ds) > 0
    item = ds.get_item(0, random_sample="random", random_sample_size=3)
    assert item["raydir"].shape == (9, 3)
    cloud = ds.load_init_points(step=1)
    assert cloud["xyz"].shape[0] > 0
    assert cloud["xyz"].shape == cloud["color"].shape


def test_llff_dataset(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "fern"
    n = 5
    pb = np.zeros((n, 17))
    for i in range(n):
        _write_png(str(root / "images" / f"img{i}.png"), _rand_img(rng))
        m = np.zeros((3, 5))
        m[:, :3] = np.eye(3)
        m[:, 3] = [0, 0, i * 0.1]
        m[:, 4] = [16, 20, 25.0]  # H W f
        pb[i, :15] = m.ravel()
        pb[i, 15:] = [2.0, 6.0]
    np.save(str(root / "poses_bounds.npy"), pb)
    cfg = DataConfig(dataset_name="llff_ft", data_root=str(tmp_path),
                     scan="fern")
    ds = find_dataset_class_by_name("llff_ft")(cfg, split="train")
    assert len(ds) == 4  # one test view held out (every 8th -> idx 0)
    item = ds.get_item(0, random_sample="random", random_sample_size=3)
    assert item["raydir"].shape == (9, 3)


def test_dtu_dataset(tmp_path):
    rng = np.random.RandomState(0)
    cams = tmp_path / "Cameras"
    os.makedirs(cams / "train", exist_ok=True)
    (cams / "pair.txt").write_text(
        "2\n0\n2 1 10.0 2 5.0\n1\n2 0 10.0 2 5.0\n")
    for v in range(3):
        ext = np.eye(4)
        ext[0, 3] = v * 0.1
        txt = ("extrinsic\n"
               + "\n".join(" ".join(str(x) for x in row) for row in ext)
               + "\n\nintrinsic\n25 0 10\n0 25 8\n0 0 1\n\n425.0 2.5\n")
        (cams / "train" / f"{v:08d}_cam.txt").write_text(txt)
        _write_png(str(tmp_path / "Rectified" / "scan1_train"
                       / f"rect_{v + 1:03d}_3_r5000.png"), _rand_img(rng))
    cfg = DataConfig(dataset_name="dtu", data_root=str(tmp_path), scan="scan1")
    ds = find_dataset_class_by_name("dtu")(cfg, split="train", nsrc=2,
                                           n_depths=8)
    assert len(ds) == 2
    group = ds.get_mvs_item(0)
    assert group["images"].shape == (3, 16, 20, 3)
    assert group["depth_values"].shape == (8,)
    assert group["depth_values"][0] == 425.0
    item = ds.get_item(0, random_sample="random", random_sample_size=3)
    assert item["raydir"].shape == (9, 3)


def test_waymo_dataset(tmp_path):
    rng = np.random.RandomState(0)
    n = 12
    np.savez(str(tmp_path / "seq0.npz"),
             images=(rng.rand(n, 3, 16, 20) * 255).astype(np.float32),
             poses=np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)),
             hwf=np.array([16, 20, 25.0]),
             intrinsic=np.array([[25.0, 0, 10, 0], [0, 25.0, 8, 0],
                                 [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
             points_xyz_all=rng.randn(100, 3).astype(np.float32))
    cfg = DataConfig(dataset_name="waymo_ft", data_root=str(tmp_path),
                     scan="seq0")
    ds = find_dataset_class_by_name("waymo_ft")(cfg, split="train")
    assert len(ds) == n - 2  # every 10th frame held out (ids 0, 10)
    item = ds.get_item(0, random_sample="random", random_sample_size=3)
    assert item["raydir"].shape == (9, 3)
    assert "frame_id" in item
    cloud = ds.load_init_points()
    assert cloud["xyz"].shape == (100, 3)


def test_dtu_ft_dataset(tmp_path):
    """dtu_ft per-scene dataset (reference data/dtu_ft_dataset.py): init
    pairs file drives train ids + MVS groups; reference scaling conventions
    (translation x 1/200, intrinsics x4) applied."""
    rng = np.random.RandomState(0)
    cams = tmp_path / "Cameras"
    os.makedirs(cams / "train", exist_ok=True)
    (cams / "pair.txt").write_text(
        "3\n0\n2 1 10.0 2 5.0\n1\n2 0 10.0 2 5.0\n2\n2 0 10.0 1 5.0\n")
    os.makedirs(tmp_path / "dtu_configs", exist_ok=True)
    (tmp_path / "dtu_configs" / "dtu_finetune_init_pairs.txt").write_text(
        "2\n0\n1,2\n1\n0,2\n")
    for v in range(3):
        ext = np.eye(4)
        ext[0, 3] = 200.0 * v * 0.1    # -> 0.1*v after the 1/200 scaling
        txt = ("extrinsic\n"
               + "\n".join(" ".join(str(x) for x in row) for row in ext)
               + "\n\nintrinsic\n25 0 10\n0 25 8\n0 0 1\n\n425.0 2.5\n")
        (cams / "train" / f"{v:08d}_cam.txt").write_text(txt)
        _write_png(str(tmp_path / "Rectified" / "scan1_train"
                       / f"rect_{v + 1:03d}_3_r5000.png"), _rand_img(rng))
    cfg = DataConfig(dataset_name="dtu_ft", data_root=str(tmp_path),
                     scan="scan1")
    ds = find_dataset_class_by_name("dtu_ft")(cfg, split="train",
                                              n_depths=8)
    assert len(ds) == 2                      # init-pair ref views 0, 1
    item = ds.get_item(0, random_sample="random", random_sample_size=3)
    assert item["raydir"].shape == (9, 3)
    np.testing.assert_allclose(item["near"], 425.0 / 200.0)
    # campos reflects the 1/200 translation scaling (c2w = inv(w2c))
    np.testing.assert_allclose(ds._cams[1][0][0, 3], 0.1, rtol=1e-6)
    group = ds.get_mvs_item(0)
    assert group["images"].shape == (3, 16, 20, 3)
    assert group["Ks"][0, 0, 0] == 100.0     # 25 * 4 full-res intrinsics
    assert group["depth_values"].shape == (8,)
    rot = ds.get_dummyrot_item(3)
    assert rot["raydir"].shape == (16 * 20, 3)
    # test split falls back to train ids on this tiny fixture
    ds_t = find_dataset_class_by_name("dtu_ft")(cfg, split="test",
                                                n_depths=8)
    assert len(ds_t) >= 1
