"""Training observability: loss accumulation, log file, image/point dumps,
video generation, optional tensorboardX.

Reimplements `Visualizer` (reference utils/visualizer.py:39-183) plus the
reference's point-cloud txt dump format (:97-117, `;`-separated columns) so
external tools consuming reference dumps keep working.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    """utils/util.py to8b."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


class Visualizer:
    def __init__(self, run_dir: str, name: str = "run",
                 use_tensorboard: bool = False):
        self.run_dir = run_dir
        self.name = name
        os.makedirs(run_dir, exist_ok=True)
        self.log_path = os.path.join(run_dir, "log.txt")
        self._acc: Dict[str, list] = {}
        self._t0 = time.time()
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self.tb = None

    # ---- losses ----------------------------------------------------------
    def reset(self):
        self._acc.clear()

    def accumulate_losses(self, items: Dict[str, float]):
        """Accepts scalars OR device arrays. Device values are held as-is
        (async futures) and only materialized at print time — calling
        float() per step would force a host-device sync every iteration,
        which dominates the step on high-latency links."""
        for k, v in items.items():
            self._acc.setdefault(k, []).append(v)

    def print_losses(self, step: int):
        def mean(vs):
            if hasattr(vs[0], "addressable_shards"):  # jax device scalars:
                import jax.numpy as jnp               # ONE stacked transfer,
                return float(jnp.mean(jnp.stack(vs)))  # not len(vs) round trips
            return float(np.mean(vs))
        means = {k: mean(vs) for k, vs in self._acc.items()}
        dt = time.time() - self._t0
        msg = f"[{self.name}] step {step} t={dt:.1f}s " + " ".join(
            f"{k}={v:.5f}" for k, v in sorted(means.items()))
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")
        if self.tb is not None:
            for k, v in means.items():
                self.tb.add_scalar(k, v, step)
        self.reset()
        return means

    # ---- images / points / video ----------------------------------------
    def save_image(self, img: np.ndarray, name: str, subdir: str = "images"):
        import imageio.v2 as imageio
        d = os.path.join(self.run_dir, subdir)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, name)
        imageio.imwrite(path, to8b(img))
        return path

    def save_neural_points(self, name: str, xyz: np.ndarray,
                           color: Optional[np.ndarray] = None,
                           subdir: str = "points"):
        """Reference txt format (visualizer.py:97-117): `x;y;z;r;g;b` rows
        with colors in 0..255."""
        d = os.path.join(self.run_dir, subdir)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name}.txt")
        if color is None:
            color = np.ones_like(xyz) * 128
        else:
            color = to8b(color).astype(np.float32)
        rows = np.concatenate([xyz, color[:, :3]], axis=-1)
        with open(path, "w") as f:
            for r in rows:
                f.write(";".join(f"{v:.6f}" for v in r) + "\n")
        return path

    def gen_video(self, frames, name: str = "video", fps: int = 24):
        """mov+gif like reference visualizer.py:85-95 (mp4 here)."""
        import imageio.v2 as imageio
        path = os.path.join(self.run_dir, f"{name}.mp4")
        try:
            imageio.mimwrite(path, [to8b(f) for f in frames], fps=fps)
        except Exception:
            path = os.path.join(self.run_dir, f"{name}.gif")
            imageio.mimwrite(path, [to8b(f) for f in frames], fps=min(fps, 20))
        return path

    def save_options(self, cfg_json: str):
        """opt.txt dump for reproducibility (options/base_options.py:289-311)."""
        with open(os.path.join(self.run_dir, "opt.json"), "w") as f:
            f.write(cfg_json)
