"""Feed-forward (generalization) training — the reference `run/train.py`
path, mode 0: every batch builds a FRESH neural point cloud from MVSNet
depth + 2D features (differentiably), renders training rays against it, and
backpropagates the pixel loss into BOTH the shading MLPs and the MVS
networks (mvs_points_volumetric_model.py:25-123: set_points(parameter=False),
alternating `optimizer` / `mvs_optimizer` by alter_step).

TPU design: the whole thing is ONE jitted step with static shapes — every
1/4-res reference pixel becomes a point (h*w points, fixed), low-confidence
points are soft-masked through conf rather than compacted (the reference's
dynamic prob_filter compaction is a CUDA memory optimization). The voxel
grid is built on stop_gradient(xyz): indices are discrete; gradients flow
through point payloads and through xyz via the aggregator distances.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PointNeRFConfig
from ..models.losses import compute_losses, mse2psnr
from ..models.points import PointCloud, PointCloudStatic
from ..models.renderer import RayBatch, render_rays
from ..mvs.points_init import MvsPointsInit
from ..ops.grid import build_grid
from .optim import alternated_update, lr_schedule


class MVSBatch(NamedTuple):
    """One generalization-training sample: V source views + target rays."""
    images: jnp.ndarray       # [V, H, W, 3]
    proj_mats: jnp.ndarray    # [V, 4, 4] plane-sweep projs (feature res)
    Ks: jnp.ndarray           # [V, 3, 3]
    w2cs: jnp.ndarray         # [V, 4, 4]
    depth_values: jnp.ndarray  # [D]
    rays: RayBatch            # target-view ray batch (with gt)


class FFState(NamedTuple):
    params: Dict[str, Any]    # {"mvs": flax params, "mlp": aggregator params}
    opt_state: Any
    step: jnp.ndarray
    key: jnp.ndarray
    mvs_stats: Any = None     # BatchNorm running stats (flax batch_stats)


def make_ff_optimizer(cfg: PointNeRFConfig):
    """Two groups: render MLPs at lr, MVS nets at lr (reference uses the
    same base lr for both, run/train.py via create_optimizer)."""
    return optax.multi_transform(
        {"mlp": optax.adam(lr_schedule(cfg.train.lr, cfg)),
         "mvs": optax.adam(lr_schedule(cfg.train.lr, cfg))},
        param_labels={"mlp": "mlp", "mvs": "mvs"})


def points_from_depth(depth: jnp.ndarray, K_quarter: jnp.ndarray,
                      c2w_ref: jnp.ndarray) -> jnp.ndarray:
    """Lift every 1/4-res pixel to a world point (depth2point,
    mvs_points_model.py:172-184 in cam coords + c2w)."""
    h, w = depth.shape
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([x, y, jnp.ones_like(x)], 0).reshape(3, -1)
    cam = jnp.linalg.inv(K_quarter) @ (pix * depth.reshape(1, -1))
    cam_h = jnp.concatenate([cam, jnp.ones((1, cam.shape[1]))], 0)
    return (c2w_ref @ cam_h)[:3].T                       # [h*w, 3]


def make_feedforward_step(cfg: PointNeRFConfig, model: MvsPointsInit,
                          capacity: int):
    """Build the jitted end-to-end step. `capacity` must cover h*w points."""
    tx = make_ff_optimizer(cfg)

    def gen_cloud(mvs_params, mvs_stats, batch: MVSBatch, train: bool):
        variables = {"params": mvs_params, "batch_stats": mvs_stats}
        if train:
            # train-mode BN: normalize with batch statistics, collect the
            # running-stat updates as an aux output (standard flax pattern)
            (depth, conf, feats, _prob), upd = model.apply(
                variables, batch.images, batch.proj_mats, batch.depth_values,
                True, method=model.depth_one_view, mutable=["batch_stats"])
            new_stats = upd["batch_stats"]
        else:
            depth, conf, feats, _prob = model.apply(
                variables, batch.images, batch.proj_mats, batch.depth_values,
                method=model.depth_one_view)
            new_stats = mvs_stats
        H = batch.images.shape[1]
        h = depth.shape[0]
        Kq = batch.Ks[0] * (h / H)
        Kq = Kq.at[2, 2].set(1.0)
        c2w_ref = jnp.linalg.inv(batch.w2cs[0])
        xyz = points_from_depth(depth, Kq, c2w_ref)      # [h*w, 3]
        conf_pts = conf.reshape(-1, 1)
        campos_ref = c2w_ref[:3, 3]
        emb, color, dirs, conf_pts = model.apply(
            {"params": mvs_params, "batch_stats": new_stats}, xyz,
            batch.images, feats, batch.Ks, batch.w2cs,
            campos_ref, conf_pts, method=model.embed_points)

        n = xyz.shape[0]
        assert n <= capacity, f"{n} points > capacity {capacity}"
        pad = capacity - n

        def p(a, fill=0.0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        pc = PointCloud(xyz=p(xyz, 1.0e8), features=p(emb), conf=p(conf_pts),
                        color=p(color), dirs=p(dirs))
        st = PointCloudStatic(num_active=jnp.asarray(n, jnp.int32),
                              Rw2c=jnp.eye(3))
        return pc, st, new_stats

    def loss_fn(params, mvs_stats, batch: MVSBatch, key):
        pc, st, new_stats = gen_cloud(params["mvs"], mvs_stats, batch,
                                      train=True)
        grid = build_grid(jax.lax.stop_gradient(pc.xyz), st.num_active,
                          cfg.query)
        out = render_rays(params["mlp"], pc, st, grid, batch.rays, cfg,
                          key=key, train=True)
        total, items = compute_losses(out, batch.rays.gt_image, cfg.loss)
        items["psnr"] = mse2psnr(
            jnp.mean((out.coarse_raycolor - batch.rays.gt_image) ** 2))
        return total, (items, new_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: FFState, batch: MVSBatch):
        key, sub = jax.random.split(state.key)
        (total, (items, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.mvs_stats, batch, sub)
        updates, new_opt = alternated_update(tx, grads, state.opt_state,
                                             state.params, state.step,
                                             cfg.train.alter_step)
        new_params = optax.apply_updates(state.params, updates)
        items["loss_total"] = total
        return FFState(params=new_params, opt_state=new_opt,
                       step=state.step + 1, key=key,
                       mvs_stats=new_stats), items

    @jax.jit
    def infer_cloud(params, mvs_stats, batch: MVSBatch):
        """Zero-shot point-cloud generation for a new scene (feed-forward
        inference, BASELINE.json config 5)."""
        pc, st, _ = gen_cloud(params["mvs"], mvs_stats, batch, train=False)
        return pc, st

    return step, infer_cloud


def create_ff_state(key, mvs_variables, agg_params, cfg: PointNeRFConfig
                    ) -> FFState:
    """mvs_variables: full flax variables dict ({'params', 'batch_stats'})."""
    params = {"mvs": mvs_variables["params"], "mlp": agg_params}
    tx = make_ff_optimizer(cfg)
    return FFState(params=params, opt_state=tx.init(params),
                   step=jnp.asarray(0, jnp.int32), key=key,
                   mvs_stats=mvs_variables.get("batch_stats", {}))
