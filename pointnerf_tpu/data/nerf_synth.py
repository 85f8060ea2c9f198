"""NeRF-Synthetic (blender) per-scene dataset.

Reimplements the reference loader + ray sampler
(data/nerf_synth360_ft_dataset.py + data/load_blender.py:62-128):
transforms_{split}.json poses (blender convention, flipped to OpenCV via
BLENDER2OPENCV), white-background compositing of RGBA images, and the
per-item ray sampling policies `random_sample` in {random, patch, no_crop}
(:580-622). Items are dicts of numpy arrays with the reference's keys
(:546-647) so drivers stay dataset-agnostic.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..camera import BLENDER2OPENCV, get_dtu_raydir, pose_spherical
from ..config import DataConfig
from . import register_dataset
from .ply import load_ply


@register_dataset("nerf_synth360_ft")
@register_dataset("nerf_synth_ft")
class NerfSynthDataset:
    def __init__(self, cfg: DataConfig, split: Optional[str] = None,
                 bg_color=(1.0, 1.0, 1.0)):
        self.cfg = cfg
        self.split = split or cfg.split
        self.root = os.path.join(cfg.data_root, cfg.scan)
        self.bg_color = np.asarray(bg_color, np.float32)
        self._load(self.split)

    # ---- loading ---------------------------------------------------------
    def _load(self, split: str):
        import imageio.v2 as imageio
        meta = json.load(open(os.path.join(self.root,
                                           f"transforms_{split}.json")))
        W, H = self.cfg.img_wh
        frames = meta["frames"]
        self.camera_angle_x = float(meta["camera_angle_x"])
        self.focal = 0.5 * W / np.tan(0.5 * self.camera_angle_x)
        self.intrinsic = np.array([[self.focal, 0, W / 2.0],
                                   [0, self.focal, H / 2.0],
                                   [0, 0, 1]], np.float32)
        self.height, self.width = H, W
        imgs, poses = [], []
        for fr in frames:
            fp = os.path.join(self.root, fr["file_path"] + ".png")
            im = imageio.imread(fp).astype(np.float32) / 255.0
            if im.shape[0] != H or im.shape[1] != W:
                import cv2
                im = cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
            if im.shape[-1] == 4:  # white-bg composite (reference :200)
                im = im[..., :3] * im[..., 3:] + self.bg_color * (1 - im[..., 3:])
            imgs.append(im[..., :3])
            # blender c2w -> OpenCV c2w (reference :135,381)
            poses.append(np.asarray(fr["transform_matrix"], np.float32)
                         @ BLENDER2OPENCV)
        self.images = np.stack(imgs)          # [V, H, W, 3]
        self.poses = np.stack(poses)          # [V, 4, 4]
        self.total = len(frames)
        self.id_list = list(range(self.total))
        # near/far: reference lego near_plane/far_plane (lego.sh:30-31)
        self.near = 2.0
        self.far = 6.0

    def __len__(self):
        return self.total

    # ---- items -----------------------------------------------------------
    def get_item(self, idx: int, random_sample: str = "no_crop",
                 random_sample_size: int = 60, seed: Optional[int] = None
                 ) -> Dict[str, np.ndarray]:
        """One view as an item dict; sampling policy per reference :580-622."""
        H, W = self.height, self.width
        pose = self.poses[idx]
        campos = pose[:3, 3]
        camrot = pose[:3, :3]
        rng = np.random.RandomState(seed if seed is not None else idx)

        if random_sample == "random":
            px = rng.randint(0, W, (random_sample_size ** 2,))
            py = rng.randint(0, H, (random_sample_size ** 2,))
        elif random_sample == "patch":
            s = random_sample_size
            x0 = rng.randint(0, W - s + 1)
            y0 = rng.randint(0, H - s + 1)
            gx, gy = np.meshgrid(np.arange(x0, x0 + s),
                                 np.arange(y0, y0 + s))
            px, py = gx.ravel(), gy.ravel()
        else:  # no_crop: full image
            gx, gy = np.meshgrid(np.arange(W), np.arange(H))
            px, py = gx.ravel(), gy.ravel()

        pix = np.stack([px, py], axis=-1).astype(np.float32)
        raydir = get_dtu_raydir(pix, self.intrinsic, camrot,
                                bool(self.cfg.dir_norm)).astype(np.float32)
        gt = self.images[idx][py, px]
        return {"campos": campos, "camrotc2w": camrot, "raydir": raydir,
                "pixel_idx": pix.astype(np.int32), "gt_image": gt,
                "near": self.near, "far": self.far,
                "intrinsic": self.intrinsic, "id": idx,
                "bg_color": self.bg_color, "h": H, "w": W}

    def get_dummyrot_item(self, idx: int, n_frames: int = 40,
                          phi: float = -30.0, radius: float = 4.0) -> Dict:
        """Spiral render pose (load_blender.py pose_spherical path +
        run/render_vid.py)."""
        theta = -180.0 + 360.0 * idx / n_frames
        c2w = pose_spherical(theta, phi, radius) @ BLENDER2OPENCV
        H, W = self.height, self.width
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        pix = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
        raydir = get_dtu_raydir(pix, self.intrinsic, c2w[:3, :3],
                                bool(self.cfg.dir_norm)).astype(np.float32)
        return {"campos": c2w[:3, 3].astype(np.float32),
                "camrotc2w": c2w[:3, :3].astype(np.float32),
                "raydir": raydir, "pixel_idx": pix.astype(np.int32),
                "gt_image": None, "near": self.near, "far": self.far,
                "intrinsic": self.intrinsic, "id": idx,
                "bg_color": self.bg_color, "h": H, "w": W}

    def load_init_points(self) -> Dict[str, np.ndarray]:
        """COLMAP fused cloud (run/train_ft.py:638-660 loads
        `colmap_results/<scan>/dense/fused.ply`)."""
        for rel in (os.path.join("colmap_results", "dense", "fused.ply"),
                    "points.ply", "fused.ply"):
            p = os.path.join(self.root, rel)
            if os.path.exists(p):
                return load_ply(p)
        raise FileNotFoundError(
            f"no init point cloud under {self.root} "
            "(looked for colmap_results/dense/fused.ply, points.ply)")
