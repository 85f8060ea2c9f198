"""Camera math: world<->perspective transforms and ray-direction generation.

TPU-native reimplementation of the reference camera utilities:
 - w2pers:           models/neural_points/neural_points.py:687-693
 - get_dtu_raydir:   data/data_utils.py:55-69
 - get_blender_raydir: data/data_utils.py:41-53
Poses follow the OpenCV convention (+z forward) after the blender2opencv flip
applied by the datasets (data/nerf_synth360_ft_dataset.py:135,381).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def w2pers(xyz_w: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """World -> perspective coords (x/z, y/z, z) in the camera frame.

    xyz_w: [..., 3]; camrotc2w: [3,3] camera-to-world rotation; campos: [3].
    Matches NeuralPoints.w2pers (neural_points.py:687): xyz_c = R^T (x - c).
    """
    shift = xyz_w - campos
    xyz_c = shift @ camrotc2w  # == (R^T @ shift^T)^T
    z = xyz_c[..., 2]
    return jnp.stack([xyz_c[..., 0] / z, xyz_c[..., 1] / z, z], axis=-1)


def pers2w(xyz_pers: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Inverse of w2pers."""
    z = xyz_pers[..., 2]
    xyz_c = jnp.stack([xyz_pers[..., 0] * z, xyz_pers[..., 1] * z, z], axis=-1)
    return xyz_c @ camrotc2w.T + campos


def get_dtu_raydir(pixelcoords, intrinsic, camrotc2w, dir_norm: bool = False):
    """Pixel coords [..., 2] -> world ray dirs [..., 3].

    Matches data/data_utils.py:55-69: x=(u+.5-cx)/fx, y=(v+.5-cy)/fy, z=1,
    rotated by the c2w rotation (dirs @ R^T).
    Works with numpy or jax arrays.
    """
    xp = jnp if isinstance(pixelcoords, jnp.ndarray) else np
    x = (pixelcoords[..., 0] + 0.5 - intrinsic[0, 2]) / intrinsic[0, 0]
    y = (pixelcoords[..., 1] + 0.5 - intrinsic[1, 2]) / intrinsic[1, 1]
    z = xp.ones_like(x)
    dirs = xp.stack([x, y, z], axis=-1)
    dirs = dirs @ camrotc2w.T
    if dir_norm:
        dirs = dirs / (xp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs


def get_blender_raydir(pixelcoords, height, width, focal, camrot, dir_norm: bool = False):
    """Blender-convention ray dirs (data/data_utils.py:41-53)."""
    xp = jnp if isinstance(pixelcoords, jnp.ndarray) else np
    x = (pixelcoords[..., 0] + 0.5 - width / 2.0) / focal
    y = (pixelcoords[..., 1] + 0.5 - height / 2.0) / focal
    z = xp.ones_like(x)
    dirs = xp.stack([x, -y, -z], axis=-1)
    dirs = xp.sum(dirs[..., None, :] * camrot[:, :], axis=-1)
    if dir_norm:
        dirs = dirs / (xp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs


BLENDER2OPENCV = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32)


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Spiral render-path pose (data/load_blender.py:51-57), blender convention."""
    trans_t = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, radius], [0, 0, 0, 1]],
                       dtype=np.float32)
    ph = phi / 180.0 * np.pi
    th = theta / 180.0 * np.pi
    rot_phi = np.array([[1, 0, 0, 0], [0, np.cos(ph), -np.sin(ph), 0],
                        [0, np.sin(ph), np.cos(ph), 0], [0, 0, 0, 1]], dtype=np.float32)
    rot_theta = np.array([[np.cos(th), 0, -np.sin(th), 0], [0, 1, 0, 0],
                          [np.sin(th), 0, np.cos(th), 0], [0, 0, 0, 1]], dtype=np.float32)
    c2w = rot_theta @ rot_phi @ trans_t
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                    dtype=np.float32)
    return flip @ c2w
