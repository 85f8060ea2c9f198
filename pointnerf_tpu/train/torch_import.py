"""Import a reference per-scene checkpoint (`{iter}_net_ray_marching.pth`).

The reference saves one torch state_dict per scene holding BOTH the neural
point cloud and the aggregator MLP weights
(models/base_model.py:99-117 save_networks; the point tensors are
registered parameters of the ray-marching module,
models/neural_points/neural_points.py:243-290):

  neural_points.xyz              [N, 3]
  neural_points.points_embeding  [1, N, F]
  neural_points.points_conf      [1, N, 1]
  neural_points.points_dir       [1, N, 3]
  neural_points.points_color     [1, N, 3]
  neural_points.Rw2c             [3, 3] (or per-point [N, 3, 3])
  aggregator.block1.{i}.weight/.bias      (nn.Sequential Linear+act pairs,
  aggregator.block3.{i}.weight/.bias       point_aggregators.py:280-345)
  aggregator.alpha_branch.{i}.weight/.bias
  aggregator.color_branch.{i}.weight/.bias

This converter maps that dict onto this framework's (PointCloud,
PointCloudStatic, aggregator params) so a reference user can bring a
trained scene across (docs/MIGRATION.md "Checkpoints"). The inverse
(`export_reference_scene`) writes a dict the reference's
load_networks(strict=False) accepts, and round-trips the importer in tests.

torch is an optional dependency (CPU build is in the image); numpy .npz
checkpoints produced by `torch_dict_to_npz` work without it.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import PointNeRFConfig
from ..models.points import PointCloud, PointCloudStatic, make_point_cloud


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    det = getattr(v, "detach", None)
    if det is not None:  # torch tensor without importing torch
        return det().cpu().numpy()
    return np.asarray(v)


def _strip_prefix(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Normalize keys: drop a DataParallel 'module.' prefix, numpy-ify."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _to_numpy(v)
    return out


# reference nn.Sequential attribute -> our param-dict key
# (point_aggregators.py:289,304,319,332,344,237)
_BLOCK_MAP = (
    ("aggregator.block1", "block1"),
    ("aggregator.block2", "block2"),
    ("aggregator.block3", "block3"),
    ("aggregator.alpha_branch", "alpha"),
    ("aggregator.color_branch", "color"),
    ("aggregator.feat_weight_mlp", "feat_weight"),
)


def _collect_mlp(sd: Dict[str, np.ndarray], prefix: str):
    """Gather `{prefix}.{i}.weight/.bias` Linear pairs in Sequential order.
    Activation modules own no parameters, so the parameterized indices are
    exactly the Linears."""
    idxs = sorted({int(k[len(prefix) + 1:].split(".")[0])
                   for k in sd if k.startswith(prefix + ".")})
    layers = []
    for i in idxs:
        w = sd.get(f"{prefix}.{i}.weight")
        b = sd.get(f"{prefix}.{i}.bias")
        if w is None:
            continue
        # torch Linear.weight is [out, in]; ours is [in, out]
        layers.append({"w": np.ascontiguousarray(w.T.astype(np.float32)),
                       "b": (b if b is not None
                             else np.zeros(w.shape[0])).astype(np.float32)})
    return layers


def import_reference_scene(state_dict, cfg: PointNeRFConfig,
                           capacity: Optional[int] = None,
                           key=None
                           ) -> Tuple[PointCloud, PointCloudStatic, Dict]:
    """Convert a reference `*_net_ray_marching.pth` state_dict (or a path to
    one) into (PointCloud, PointCloudStatic, aggregator params).

    The aggregator param tree is validated shape-for-shape against
    `init_aggregator_params(cfg.agg)` — a mismatch means cfg.agg does not
    describe the checkpoint's architecture (wrong widths/layer counts) and
    raises with both shapes named.
    """
    import jax
    import jax.numpy as jnp
    from ..models.aggregator import init_aggregator_params

    if isinstance(state_dict, (str, bytes)):
        import torch
        state_dict = torch.load(state_dict, map_location="cpu")
    sd = _strip_prefix(state_dict)

    required = ["neural_points.xyz", "neural_points.points_embeding"]
    missing = [k for k in required if k not in sd]
    if missing:
        raise KeyError(f"not a reference scene checkpoint: missing {missing}")

    xyz = sd["neural_points.xyz"].reshape(-1, 3).astype(np.float32)
    n = xyz.shape[0]

    def pts(name, width, fill):
        v = sd.get(f"neural_points.{name}")
        if v is None:
            return np.full((n, width), fill, np.float32)
        return v.reshape(n, width).astype(np.float32)

    feats = sd["neural_points.points_embeding"].reshape(n, -1)
    if feats.shape[1] != cfg.agg.point_features_dim:
        raise ValueError(
            f"checkpoint feature dim {feats.shape[1]} != "
            f"cfg.agg.point_features_dim {cfg.agg.point_features_dim}")
    pc, st = make_point_cloud(
        xyz, key if key is not None else jax.random.PRNGKey(0), cfg.points,
        cfg.agg.point_features_dim, features=feats.astype(np.float32),
        conf=pts("points_conf", 1, cfg.points.default_conf),
        color=pts("points_color", 3, 0.0),
        dirs=pts("points_dir", 3, 0.0), capacity=capacity)

    rw2c = sd.get("neural_points.Rw2c")
    if rw2c is not None:
        rw2c = rw2c.astype(np.float32)
        if rw2c.ndim == 3:  # per-point rotations (editing composites)
            full = np.broadcast_to(np.eye(3, dtype=np.float32),
                                   (pc.capacity, 3, 3)).copy()
            full[:n] = rw2c
            rw2c = full
        st = st._replace(Rw2c=jnp.asarray(rw2c))

    params = {}
    for t_prefix, ours in _BLOCK_MAP:
        layers = _collect_mlp(sd, t_prefix)
        if layers:
            params[ours] = [{"w": jnp.asarray(l["w"]),
                             "b": jnp.asarray(l["b"])} for l in layers]

    want = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    want_shapes = jax.tree.map(lambda x: tuple(x.shape), want)
    if got_shapes != want_shapes:
        raise ValueError(
            "aggregator architecture mismatch between the checkpoint and "
            f"cfg.agg:\n  checkpoint: {got_shapes}\n  config:     "
            f"{want_shapes}")
    return pc, st, params


def export_reference_scene(pc: PointCloud, st: PointCloudStatic,
                           agg_params: Dict, num_active: Optional[int] = None
                           ) -> Dict[str, np.ndarray]:
    """Build a reference-format `net_ray_marching` state_dict (numpy values;
    pass through torch.save for a .pth the reference's
    load_networks(strict=False) accepts). Inverse of
    import_reference_scene."""
    n = int(num_active if num_active is not None else st.num_active)
    sd: Dict[str, np.ndarray] = {
        "neural_points.xyz": np.asarray(pc.xyz)[:n],
        "neural_points.points_embeding": np.asarray(pc.features)[None, :n],
        "neural_points.points_conf": np.asarray(pc.conf)[None, :n],
        "neural_points.points_color": np.asarray(pc.color)[None, :n],
        "neural_points.points_dir": np.asarray(pc.dirs)[None, :n],
        "neural_points.Rw2c": np.asarray(st.Rw2c),
    }
    for t_prefix, ours in _BLOCK_MAP:
        layers = agg_params.get(ours)
        if not layers:
            continue
        # Linear at even Sequential indices (Linear+activation pairs;
        # the final Linear of alpha/color sits right after the last pair)
        for i, layer in enumerate(layers):
            sd[f"{t_prefix}.{2 * i}.weight"] = np.ascontiguousarray(
                np.asarray(layer["w"]).T)
            sd[f"{t_prefix}.{2 * i}.bias"] = np.asarray(layer["b"])
    return sd


def torch_dict_to_npz(pth_path: str, npz_path: str):
    """One-time torch -> npz conversion so downstream import needs no torch."""
    import torch
    sd = torch.load(pth_path, map_location="cpu")
    np.savez(npz_path, **_strip_prefix(sd))


def load_npz_checkpoint(npz_path: str) -> Dict[str, np.ndarray]:
    with np.load(npz_path) as z:
        return {k: z[k] for k in z.files}
