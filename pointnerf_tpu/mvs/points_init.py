"""MVS-based neural-point initialization.

Replaces `MvsPointsModel` (models/mvs/mvs_points_model.py:38-405): per
init view, run MVSNet depth + confidence, cross-view geometric filtering,
then lift surviving pixels to world points and attach per-point payloads —
2D CNN features sampled at the points' projections, colors, view dirs, and
confidence, optionally compressed by a small MLP ("premlp",
mvs_points_model.py:257-259) to `point_features_dim`.

The reference's feature-string config (`imgfeat_0_0123 dir_0 point_conf`,
query_embedding :226-260) is realized as: features = concat over init views
of FeatureNet samples; color from the ref image; dir = normalized
point-to-ref-camera direction in world; conf = photometric confidence.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sample2d import bilinear_sample
from .filter import filter_by_masks
from .mvsnet import MVSNet


def view_proj_mats(Ks: np.ndarray, w2cs: np.ndarray, ref: int,
                   scale: float = 0.25) -> np.ndarray:
    """Combined plane-sweep projections src_proj @ inv(ref_proj) at feature
    resolution (reference dataset convention consumed by homo_warping;
    FeatureNet runs at 1/4 res so intrinsics scale by 0.25)."""
    V = Ks.shape[0]
    out = np.zeros((V, 4, 4), np.float32)
    def proj(v):
        K = Ks[v].copy()
        K[:2] *= scale
        P = np.eye(4, dtype=np.float64)
        P[:3] = K @ w2cs[v][:3]
        return P
    ref_inv = np.linalg.inv(proj(ref))
    for v in range(V):
        out[v] = (proj(v) @ ref_inv).astype(np.float32)
    return out


class MvsPointsInit(nn.Module):
    """MVSNet + premlp bundle. Methods are flax-callable via .apply with
    `method=`."""
    point_features_dim: int = 32
    premlp_layers: int = 1          # shading_feature_mlp_layer0
    align_corners: bool = True      # False for torch-imported checkpoints

    def setup(self):
        self.mvsnet = MVSNet(align_corners=self.align_corners)
        if self.premlp_layers > 0:
            self.premlp = [nn.Dense(self.point_features_dim)
                           for _ in range(self.premlp_layers)]

    def depth_one_view(self, imgs, proj_mats, depth_values,
                       train: bool = False):
        """imgs [V,H,W,3] (view 0 = reference), proj_mats [V,4,4] at feature
        res, depth_values [D]. Returns (depth, conf, features, prob)."""
        return self.mvsnet(imgs, proj_mats, depth_values, train=train)

    def features_only(self, imgs, train: bool = False):
        return self.mvsnet.extract_features(imgs, train)

    def embed_points(self, xyz_world, imgs, feats, Ks, w2cs, campos_ref,
                     conf):
        """Attach payloads to world points.

        xyz_world [N,3]; imgs [V,H,W,3]; feats [V,h,w,32] (1/4 res);
        Ks [V,3,3]; w2cs [V,4,4]; campos_ref [3]; conf [N,1].
        Returns (embedding [N,F], color [N,3], dirs [N,3], conf)."""
        V = imgs.shape[0]
        N = xyz_world.shape[0]
        ones = jnp.ones((N, 1))
        xyz_h = jnp.concatenate([xyz_world, ones], axis=-1)     # [N,4]

        samples = []
        colors = None
        for v in range(V):
            cam = (xyz_h @ w2cs[v].T)[:, :3]
            z = jnp.maximum(cam[:, 2], 1e-6)
            pix = cam @ Ks[v].T
            x = pix[:, 0] / z
            y = pix[:, 1] / z
            samples.append(bilinear_sample(feats[v], x * 0.25, y * 0.25))
            if v == 0:
                colors = bilinear_sample(imgs[v], x, y)
        feat_cat = jnp.concatenate(samples, axis=-1)            # [N, V*32]

        dirs = xyz_world - campos_ref[None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)

        if self.premlp_layers > 0:
            x = jnp.concatenate([feat_cat, colors, dirs, conf], axis=-1)
            for i, lyr in enumerate(self.premlp):
                x = lyr(x)
                if i < len(self.premlp) - 1:
                    x = nn.leaky_relu(x, 0.01)
            embedding = x
        else:
            embedding = feat_cat
        return embedding, colors, dirs, conf


def init_mvs_points(model: MvsPointsInit, rng, V: int = 3, H: int = 32,
                    W: int = 32, n_depths: int = 8):
    """Initialize ALL submodules (MVSNet + premlp) in one variables dict —
    flax lazy init only creates params on the traced path, so both methods
    must run."""
    imgs = jnp.zeros((V, H, W, 3), jnp.float32)
    projs = jnp.stack([jnp.eye(4)] * V)
    dv = jnp.linspace(2.0, 6.0, n_depths)

    def init_all(mdl):
        _d, _c, feats, _p = mdl.depth_one_view(imgs, projs, dv)
        xyz = jnp.zeros((4, 3), jnp.float32)
        Ks = jnp.stack([jnp.eye(3)] * V)
        w2cs = projs
        mdl.embed_points(xyz, imgs, feats, Ks, w2cs, jnp.zeros((3,)),
                         jnp.zeros((4, 1)))
        return None

    return model.init(rng, method=init_all)


def load_pretrained_mvsnet(variables, ckpt_path: str,
                           model: Optional[MvsPointsInit] = None):
    """Overwrite the MVSNet subtree of an MvsPointsInit variables dict with
    a converted torch checkpoint (the reference's pretrained-init path,
    mvs_points_model.py:38-90). The premlp stays at its fresh init — the
    reference trains it per scene. Build the model with align_corners=False
    to match the checkpoint's as-run grid_sample semantics (torch>=1.3
    default) — pass `model` to have this checked; imported weights evaluated
    under align_corners=True sample every warped feature at a sub-pixel
    scale+shift and silently degrade depth quality."""
    from .torch_import import load_mvsnet_checkpoint

    if model is not None and model.align_corners:
        raise ValueError(
            "imported torch checkpoints require "
            "MvsPointsInit(align_corners=False); this model was built with "
            "align_corners=True")
    conv = load_mvsnet_checkpoint(ckpt_path)
    out = dict(variables)
    out["params"] = dict(variables["params"], mvsnet=conv["params"])
    out["batch_stats"] = dict(variables.get("batch_stats", {}),
                              mvsnet=conv["batch_stats"])
    return out


def gen_scene_points(params, model: MvsPointsInit, images: np.ndarray,
                     Ks: np.ndarray, w2cs: np.ndarray,
                     near_far: Tuple[float, float], n_depths: int = 128,
                     depth_conf_thresh: float = 0.8, geo_cnsst_num: int = 3,
                     batch_stats=None) -> Dict[str, np.ndarray]:
    """Full init pipeline over all views (reference
    gen_points_filter_embeddings, run/train_ft.py:54-170).

    images [V,H,W,3] float in [0,1]; Ks [V,3,3]; w2cs [V,4,4].
    Returns dict(xyz, embedding, color, dirs, conf) as numpy."""
    V, H, W, _ = images.shape
    depth_values = np.linspace(near_far[0], near_far[1], n_depths,
                               dtype=np.float32)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    depths, confs, K4 = [], [], []
    feats_per_view = None
    for ref in range(V):
        order = [ref] + [v for v in range(V) if v != ref]
        projs = view_proj_mats(Ks, w2cs, ref)[order]
        d, c, feats, _prob = model.apply(
            variables, jnp.asarray(images[order]), jnp.asarray(projs),
            jnp.asarray(depth_values), method=model.depth_one_view)
        depths.append(np.asarray(d))
        confs.append(np.asarray(c))
        if ref == 0:
            # features come back permuted by `order`; keep view-0 ordering
            inv = np.argsort(order)
            feats_per_view = np.asarray(feats)[inv]
        K4.append(Ks[ref].copy())
    h, w = depths[0].shape
    # depth maps live at 1/4 resolution -> scale intrinsics accordingly
    Ks_quarter = []
    for K in K4:
        Kq = K.copy()
        Kq[:2] *= (h / H)
        Ks_quarter.append(Kq)

    xyz_lst, conf_lst = filter_by_masks(
        depths, confs, Ks_quarter, [w2cs[v] for v in range(V)],
        depth_conf_thresh=depth_conf_thresh, geo_cnsst_num=geo_cnsst_num)
    xyz = np.concatenate(xyz_lst) if xyz_lst else np.zeros((0, 3), np.float32)
    conf = (np.concatenate(conf_lst)[:, None] if conf_lst
            else np.zeros((0, 1), np.float32))

    if xyz.shape[0] == 0:
        F = model.point_features_dim
        return {"xyz": xyz, "embedding": np.zeros((0, F), np.float32),
                "color": np.zeros((0, 3), np.float32),
                "dirs": np.zeros((0, 3), np.float32), "conf": conf}

    campos_ref = np.linalg.inv(w2cs[0])[:3, 3]
    emb, color, dirs, conf_j = model.apply(
        variables, jnp.asarray(xyz), jnp.asarray(images),
        jnp.asarray(feats_per_view), jnp.asarray(Ks), jnp.asarray(w2cs),
        jnp.asarray(campos_ref), jnp.asarray(conf),
        method=model.embed_points)
    return {"xyz": xyz, "embedding": np.asarray(emb),
            "color": np.asarray(color), "dirs": np.asarray(dirs),
            "conf": np.asarray(conf)}
