"""Import the official pretrained torch MVSNet checkpoint into the flax model.

The reference's per-scene point initialization quality rests entirely on the
*pretrained* MVSNet weights (models/depth_estimators/mvsnet.py:98-143, loaded
strict in mvs_points_model.py:38-90 from `--depth_vid` checkpoints). This
module converts that torch `state_dict` into the flax variables tree of
`pointnerf_tpu.mvs.mvsnet.MVSNet`, whose submodule names mirror the torch
attribute names 1:1.

Layout transposes:
  Conv2d          OIHW        -> HWIO     (2, 3, 1, 0)
  Conv3d          OIDHW       -> DHWIO    (2, 3, 4, 1, 0)
  ConvTranspose3d (in,out,DHW) -> DHW,out,in (2, 3, 4, 1, 0)
     (flax ConvTranspose(transpose_kernel=True) stores (*k, out, in) and
      flips spatially at apply time — exactly torch's transposed conv)
  BatchNorm       weight/bias/running_mean/running_var
                  -> scale/bias (params) + mean/var (batch_stats)

Use MVSNet(align_corners=False) with imported weights so the plane-sweep
sampling matches the torch grid_sample semantics the checkpoint was
evaluated with (see mvsnet.homo_warp).

Forward parity vs the reference torch module with identical (random)
weights is tested in tests/test_mvs_import.py (the actual .ckpt is not in
this environment; any real checkpoint goes through the same path).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (no torch import needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _set(tree: Dict, path, leaf):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = leaf


def convert_mvsnet_state_dict(sd: Mapping[str, "np.ndarray"]) -> Dict:
    """torch MVSNet.state_dict() -> flax variables {'params', 'batch_stats'}.

    Accepts tensors or numpy arrays. Unknown keys (e.g. the optional
    RefineNet, num_batches_tracked counters) are ignored with the same
    effect as the reference's strict=False loads (base_model.py:118-133).
    """
    params: Dict = {}
    stats: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        # strip a leading "module." (DataParallel-saved checkpoints)
        if parts[0] == "module":
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked" or parts[0] == "refine_network":
            continue
        arr = _np(val)
        net, block, rest = parts[0], parts[1], parts[2:]
        if net not in ("feature", "cost_regularization"):
            continue

        if net == "feature" and block == "feature":
            # final plain Conv2d with bias
            kind, leaf = "conv2d", rest[0]
            path = (net, "feature")
        elif block == "prob":
            kind, leaf = "conv3d", rest[0]
            path = (net, "prob")
        elif block in ("conv7", "conv9", "conv11"):
            # nn.Sequential: .0 = ConvTranspose3d, .1 = BatchNorm3d
            idx, leaf = rest[0], rest[1]
            kind = "deconv3d" if idx == "0" else "bn"
            path = (net, block, "deconv" if idx == "0" else "bn")
        else:
            # ConvBnReLU(3D): .conv / .bn
            sub, leaf = rest[0], rest[1]
            kind = ("bn" if sub == "bn"
                    else ("conv2d" if net == "feature" else "conv3d"))
            path = (net, block, sub)

        if kind == "conv2d" and leaf == "weight":
            _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
        elif kind == "conv3d" and leaf == "weight":
            _set(params, path + ("kernel",), arr.transpose(2, 3, 4, 1, 0))
        elif kind == "deconv3d" and leaf == "weight":
            # torch (in, out, kD, kH, kW) -> flax transpose_kernel (*k, out, in)
            _set(params, path + ("kernel",), arr.transpose(2, 3, 4, 1, 0))
        elif leaf == "bias" and kind != "bn":
            _set(params, path + ("bias",), arr)
        elif kind == "bn":
            if leaf == "weight":
                _set(params, path + ("scale",), arr)
            elif leaf == "bias":
                _set(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                _set(stats, path + ("mean",), arr)
            elif leaf == "running_var":
                _set(stats, path + ("var",), arr)
        else:
            raise ValueError(f"unrecognized MVSNet checkpoint key: {key}")
    return {"params": params, "batch_stats": stats}


def load_mvsnet_checkpoint(path: str) -> Dict:
    """Load a torch .ckpt file (mvs_points_model.py:38-90 format: either a
    raw state_dict or {'model'|'state_dict'|'network_state_dict': sd})."""
    import torch  # local import: torch is optional at runtime

    blob = torch.load(path, map_location="cpu")
    for k in ("model", "state_dict", "network_state_dict"):
        if isinstance(blob, dict) and k in blob:
            blob = blob[k]
            break
    return convert_mvsnet_state_dict(blob)
