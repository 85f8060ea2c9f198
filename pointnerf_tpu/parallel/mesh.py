"""Device-mesh construction.

TPU-native replacement for the reference's DataParallel / NCCL-DDP process
groups (reference: models/neural_points_volumetric_model.py:173-176,
train_ddp.py:632-669). Two mesh axes cover Point-NeRF's scaling dimensions
(SURVEY.md §2.3):

  dp — rays (the batch axis): pure data parallelism, gradient psum.
  mp — neural points: the point cloud, its occupancy grid, and its Adam state
       are sharded over mp; per-ray KNN candidates are exchanged with a single
       all_to_all and merged by a global top-K (parallel/sharded.py).

Collectives ride ICI when dp×mp fits a slice; one JAX process per host handles
the DCN boundary exactly as recommended by the JAX multi-host docs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int, mp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """A (dp, mp) mesh over the given devices (default: all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if dp * mp > len(devs):
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, "
                         f"have {len(devs)}")
    grid = np.asarray(devs[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, ("dp", "mp"))
