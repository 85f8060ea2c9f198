"""ScanNet per-scene dataset (exported frames).

Reimplements data/scannet_ft_dataset.py: scene dir with `color/<i>.jpg`,
`pose/<i>.txt` (4x4 c2w), `intrinsic/intrinsic_color.txt`, and
`depth/<i>.png` (16-bit millimeter depth) used for sensor-depth point
initialization (`load_init_depth_points`, scannet_ft_dataset.py:420+)."""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from ..camera import get_dtu_raydir
from ..config import DataConfig
from . import register_dataset


@register_dataset("scannet_ft")
class ScannetDataset:
    def __init__(self, cfg: DataConfig, split: Optional[str] = None,
                 bg_color=(0.0, 0.0, 0.0), step: int = 1):
        self.cfg = cfg
        self.split = split or cfg.split
        self.root = os.path.join(cfg.data_root, cfg.scan)
        self.bg_color = np.asarray(bg_color, np.float32)
        ids = sorted(int(os.path.splitext(os.path.basename(p))[0])
                     for p in glob.glob(os.path.join(self.root, "color", "*")))
        # reference: every 5th frame test, rest train (scannet convention)
        test_ids = ids[::5]
        train_ids = [i for i in ids if i not in set(test_ids)]
        self.id_list = (train_ids if self.split == "train" else test_ids)[::step]
        self.intrinsic = np.loadtxt(os.path.join(
            self.root, "intrinsic", "intrinsic_color.txt")
        ).astype(np.float32)[:3, :3]
        import imageio.v2 as imageio
        probe = imageio.imread(self._color_path(self.id_list[0]))
        self.height, self.width = probe.shape[:2]
        self.total = len(self.id_list)
        self.near, self.far = 0.1, 10.0

    def _color_path(self, i):
        for ext in (".jpg", ".png"):
            p = os.path.join(self.root, "color", f"{i}{ext}")
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"frame {i}")

    def __len__(self):
        return self.total

    def _pose(self, i):
        return np.loadtxt(os.path.join(self.root, "pose", f"{i}.txt")
                          ).astype(np.float32)

    def get_item(self, idx: int, random_sample: str = "no_crop",
                 random_sample_size: int = 60,
                 seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        import imageio.v2 as imageio
        i = self.id_list[idx]
        img = imageio.imread(self._color_path(i)).astype(np.float32) / 255.0
        pose = self._pose(i)
        H, W = self.height, self.width
        rng = np.random.RandomState(seed if seed is not None else idx)
        if random_sample == "random":
            px = rng.randint(0, W, (random_sample_size ** 2,))
            py = rng.randint(0, H, (random_sample_size ** 2,))
        else:
            gx, gy = np.meshgrid(np.arange(W), np.arange(H))
            px, py = gx.ravel(), gy.ravel()
        pix = np.stack([px, py], -1).astype(np.float32)
        raydir = get_dtu_raydir(pix, self.intrinsic, pose[:3, :3],
                                bool(self.cfg.dir_norm)).astype(np.float32)
        return {"campos": pose[:3, 3], "camrotc2w": pose[:3, :3],
                "raydir": raydir, "pixel_idx": pix.astype(np.int32),
                "gt_image": img[..., :3][py, px], "near": self.near,
                "far": self.far, "intrinsic": self.intrinsic, "id": idx,
                "bg_color": self.bg_color, "h": H, "w": W}

    def load_init_points(self, step: int = 10, max_depth: float = 10.0,
                         depth_scale: float = 1000.0) -> Dict[str, np.ndarray]:
        """Sensor-depth point cloud: unproject every `step`-th frame's depth
        map (scannet_ft_dataset.py:420+)."""
        import imageio.v2 as imageio
        xyz_all, col_all = [], []
        for idx in range(0, self.total, step):
            i = self.id_list[idx]
            dpath = os.path.join(self.root, "depth", f"{i}.png")
            if not os.path.exists(dpath):
                continue
            depth = imageio.imread(dpath).astype(np.float32) / depth_scale
            img = imageio.imread(self._color_path(i)).astype(np.float32) / 255.0
            if depth.shape != img.shape[:2]:
                import cv2
                depth = cv2.resize(depth, (img.shape[1], img.shape[0]),
                                   interpolation=cv2.INTER_NEAREST)
            pose = self._pose(i)
            H, W = depth.shape
            gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            valid = (depth > 0) & (depth < max_depth)
            z = depth[valid]
            pix = np.stack([gx[valid], gy[valid], np.ones_like(z)], 0)
            cam = np.linalg.inv(self.intrinsic) @ (pix * z)
            world = (pose[:3, :3] @ cam + pose[:3, 3:4]).T
            xyz_all.append(world.astype(np.float32))
            col_all.append(img[..., :3][valid])
        xyz = np.concatenate(xyz_all) if xyz_all else np.zeros((0, 3), np.float32)
        col = np.concatenate(col_all) if col_all else np.zeros((0, 3), np.float32)
        return {"xyz": xyz, "color": col}
