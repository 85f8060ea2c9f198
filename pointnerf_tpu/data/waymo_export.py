"""Waymo TFRecord -> npz bundle exporter (reference data/load_waymo.py:177+).

The reference reads Waymo Open Dataset TFRecords inline at every training
launch (tensorflow + waymo_open_dataset + cv2 + torch, load_waymo.py:1-19).
Here ingestion is a ONE-TIME export to the npz bundle `data/waymo.py`
consumes (keys images/poses/intrinsic/hwf/points_xyz_all/camposes/
centerdirs), so training needs only numpy.

Two layers:
 - `frames_to_npz(frames, ...)`: pure numpy. Applies the reference's
   pipeline — camera2world pose composition, the NeRF-convention axis remap
   [-y, z, -x, t] (load_waymo.py:284), intrinsic/image rescale
   (:288-300), per-frame LiDAR -> world transform (:247-248) with voxel
   downsampling (:250-251 via ops/voxel.py), every-`step`th-frame test split
   (:286-287), and center-pixel ray dirs (:257). Fully testable without
   TF (tests/test_waymo_export.py).
 - `read_waymo_tfrecord(path)`: generator of per-frame dicts using
   tensorflow + waymo_open_dataset (+ cv2 for undistortion). Optional
   imports, gated with actionable errors; only needed where the raw
   TFRecords live.

CLI: scripts/export_waymo.py.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from ..camera import get_dtu_raydir

# reference pose convention remap (load_waymo.py:284): columns
# [-y, z, -x, t] of the camera2world matrix
_NERF_COLS = ((1, -1.0), (2, 1.0), (0, -1.0))


def _remap_pose(c2w: np.ndarray) -> np.ndarray:
    cols = [c2w[:, i:i + 1] * s for i, s in _NERF_COLS]
    return np.concatenate(cols + [c2w[:, 3:4]], axis=1).astype(np.float32)


def frames_to_npz(frames: Iterable[Dict], out_path: str, step: int = 10,
                  scale_factor: float = 10.0, vox_res: int = 100,
                  target_upscale: int = 2) -> Dict[str, np.ndarray]:
    """Assemble per-frame dicts into the waymo_ft npz bundle.

    frames: iterable of dicts with
      image  [H, W, 3] float32 in [0, 1] (undistorted full-res)
      c2w    [4, 4] camera-to-world
      K      [3, 3] full-res intrinsics
      points_world [M, 3] or None (LiDAR, world frame; the reference skips
                   every 10th frame's points, load_waymo.py:223)
    step/scale_factor/vox_res/target_upscale follow load_waymo_data's
    defaults: every `step`th frame is test, images downsample by
    `scale_factor` then render at `target_upscale`x that (:288-300 keeps
    images at 2x the pose/intrinsic scale).

    Returns the bundle dict (also written to out_path when it is not None).
    """
    imgs, poses, pts, camposes, centerdirs = [], [], [], [], []
    K = None
    for f in frames:
        img = np.asarray(f["image"], np.float32)
        c2w = np.asarray(f["c2w"], np.float32)
        if K is None:
            K = np.asarray(f["K"], np.float32).copy()
            H, W = img.shape[:2]
        if f.get("points_world") is not None:
            p = np.asarray(f["points_world"], np.float32).reshape(-1, 3)
            if vox_res > 0 and p.shape[0] > vox_res:
                from ..ops.voxel import construct_vox_points_closest
                idx, _ = construct_vox_points_closest(p, vox_res)
                p = p[np.asarray(idx)]
            pts.append(p)
        # center-pixel view dir at the EXPORT resolution (:185, :257)
        wh = (int(W // scale_factor), int(H // scale_factor))
        center = np.asarray(wh, np.float32)[None, :] // 2
        Ks = K / scale_factor
        Ks[2, 2] = 1.0
        centerdirs.append(get_dtu_raydir(center, Ks, c2w[:3, :3], True))
        camposes.append(c2w[:3, 3])
        poses.append(_remap_pose(c2w))
        # image resampled to target_upscale x the pose scale (:294-300)
        th, tw = wh[1] * target_upscale, wh[0] * target_upscale
        imgs.append(_resize_area(img, th, tw))

    if K is None:
        raise ValueError("no frames to export")
    n = len(imgs)
    ids = list(range(n))
    Ks = K / scale_factor
    Ks[2, 2] = 1.0
    # the BUNDLE intrinsic must match the exported image resolution: the
    # loader derives H, W from images and reads `intrinsic` as-is
    Kb = Ks * target_upscale
    Kb[2, 2] = 1.0
    bundle = {
        "images": np.stack(imgs).astype(np.float32),
        "poses": np.stack(poses).astype(np.float32),
        "intrinsic": Kb.astype(np.float32),
        "hwf": np.asarray([imgs[0].shape[0], imgs[0].shape[1],
                           float(Kb[0, 0])], np.float32),
        "camposes": np.stack(camposes).astype(np.float32),
        "centerdirs": np.concatenate(centerdirs).astype(np.float32),
        "test_ids": np.asarray(ids[::step], np.int64),
        "train_ids": np.asarray([i for i in ids if i % step != 0], np.int64),
    }
    if pts:
        bundle["points_xyz_all"] = np.concatenate(pts).astype(np.float32)
    if out_path is not None:
        np.savez_compressed(out_path, **bundle)
    return bundle


def _resize_area(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Area-style resize without cv2: box-average when downscaling by an
    integer factor, bilinear otherwise (cv2.INTER_AREA equivalent for the
    integer case the pipeline uses)."""
    H, W = img.shape[:2]
    if H == th and W == tw:
        return img
    if H % th == 0 and W % tw == 0:
        fh, fw = H // th, W // tw
        return img[: th * fh, : tw * fw].reshape(
            th, fh, tw, fw, -1).mean(axis=(1, 3)).astype(np.float32)
    ys = np.clip((np.arange(th) + 0.5) * H / th - 0.5, 0, H - 1)
    xs = np.clip((np.arange(tw) + 0.5) * W / tw - 0.5, 0, W - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    out = (img[y0][:, x0] * (1 - wy) * (1 - wx)
           + img[y0][:, x1] * (1 - wy) * wx
           + img[y1][:, x0] * wy * (1 - wx)
           + img[y1][:, x1] * wy * wx)
    return out.astype(np.float32)


def read_waymo_tfrecord(path: str, frames_length: int = 30,
                        start_frame: int = 0, load_points: bool = True,
                        camera: int = 0) -> Iterable[Dict]:
    """Yield per-frame dicts from a Waymo Open Dataset TFRecord
    (load_waymo.py:180-262). Requires tensorflow + waymo_open_dataset
    (+ cv2 for lens undistortion) — none are baked into this image, so the
    import is gated; run where the raw data lives."""
    try:
        import tensorflow.compat.v1 as tf
        from waymo_open_dataset import dataset_pb2 as open_dataset
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:
        raise ImportError(
            "read_waymo_tfrecord needs `tensorflow` and "
            "`waymo_open_dataset` (pip install waymo-open-dataset-tf-2-11-0)"
            " — export the npz bundle on a machine that has them; training "
            "itself only needs the bundle") from e
    try:
        import cv2
    except ImportError:
        cv2 = None

    tf.enable_eager_execution()
    dataset = tf.data.TFRecordDataset(path, compression_type="")
    K = dist = pose_cam2veh = None
    emitted = 0
    for index, data in enumerate(dataset):
        if index < start_frame:
            continue
        if frames_length != -1 and emitted >= frames_length:
            break
        emitted += 1
        frame = open_dataset.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        # repeated proto fields carry NO camera ordering guarantee — sort by
        # camera name so `camera` indexes the same physical camera in
        # images, calibrations, AND the LiDAR projection mask below
        # (0 = FRONT; the reference sorts likewise, load_waymo.py:204)
        images_sorted = sorted(frame.images, key=lambda i: i.name)
        cam = images_sorted[camera]
        pose_veh2world = np.reshape(
            np.array(frame.pose.transform, np.float32), (4, 4))
        img = (np.array(tf.image.decode_jpeg(cam.image)) / 255.0
               ).astype(np.float32)
        if K is None:
            calib = sorted(frame.context.camera_calibrations,
                           key=lambda c: c.name)[camera]
            intr = calib.intrinsic
            # waymo intrinsic layout: [f_u, f_v, c_u, c_v, k1..k3, p1, p2]
            K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]],
                          [0, 0, 1]], np.float32)
            dist = np.asarray(intr[4:9], np.float32)
            pose_cam2veh = np.array(calib.extrinsic.transform,
                                    np.float32).reshape(4, 4)
        if cv2 is not None:
            img = cv2.undistort(img, K, dist, None, K)
        points_world = None
        # every 10th frame contributes no LiDAR (test frames, :223)
        if load_points and index % 10 != 0:
            ri, cp, top_pose = \
                frame_utils.parse_range_image_and_camera_projection(frame)
            points, cp_points = frame_utils.convert_range_image_to_point_cloud(
                frame, ri, cp, top_pose)
            pa = np.concatenate(points, axis=0).astype(np.float32)
            cpa = np.concatenate(cp_points, axis=0)
            # keep points projecting into THE exported camera (same sorted
            # index as `cam` above)
            mask = cpa[..., 0] == images_sorted[camera].name
            p_vehicle = pa[mask]
            points_world = (pose_veh2world[:3, :3] @ p_vehicle.T
                            + pose_veh2world[:3, 3][:, None]).T
        yield {"image": img, "c2w": pose_veh2world @ pose_cam2veh, "K": K,
               "points_world": points_world}


def export_sequences(tfrecords: Sequence[str], out_dir: str,
                     **kwargs) -> List[str]:
    """Export several TFRecord sequences to per-sequence npz bundles (the
    multiseq layout data/waymo.load_multiseq consumes, one cloud per
    sequence mapping onto the mp point axis)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    read_kw = {k: kwargs.pop(k) for k in
               ("frames_length", "start_frame", "load_points", "camera")
               if k in kwargs}
    for rec in tfrecords:
        name = os.path.splitext(os.path.basename(rec))[0] + ".npz"
        out = os.path.join(out_dir, name)
        frames_to_npz(read_waymo_tfrecord(rec, **read_kw), out, **kwargs)
        outs.append(out)
    return outs
