"""Feature rendering + 2D neural-render head training (fork waymo mode).

The fork's active model renders `shading_color_channel_num=128` feature
channels per ray over a square patch and decodes the patch to RGB with a 2D
CNN (or StyleGAN2 with per-frame style codes) —
neural_points_volumetric_model.py:258-264,341-351 and train_ddp.py:747-807.
Here: one jitted step renders the patch's rays through the standard point
pipeline (C=128, zero background), reshapes to an image, applies the head,
and backpropagates the RGB loss into the head + aggregator + point payloads.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import PointNeRFConfig
from ..models.losses import mse2psnr
from ..models.neural_render import Generator, NeuralRenderer, StyleVectorizer
from ..models.points import PointCloud, PointCloudStatic
from ..models.renderer import RayBatch, render_rays
from ..ops.grid import PointGrid
from .optim import lr_schedule
from .step import TrainState


class Neural2DState(NamedTuple):
    params: Dict[str, Any]   # {"mlp", "points", "head"[, "style"]}
    opt_state: Any
    step: jnp.ndarray
    key: jnp.ndarray


def make_neural2d_optimizer(cfg: PointNeRFConfig):
    lr = lr_schedule(cfg.train.lr, cfg)
    groups = {"mlp": optax.adam(lr),
              "points": optax.adam(lr_schedule(cfg.train.plr, cfg)),
              "head": optax.adam(lr), "style": optax.adam(lr),
              "stylevec": optax.adam(lr)}

    def labeler(params):
        return {k: k for k in params}
    return optax.multi_transform(groups, param_labels=labeler)


def make_neural2d_step(cfg: PointNeRFConfig, head: NeuralRenderer,
                       patch: int,
                       generator: Optional[Generator] = None,
                       vectorizer: Optional[StyleVectorizer] = None):
    """Jitted step. `patch` = random_sample_size (rays = patch²).

    With `generator`/`vectorizer` set, the StyleGAN2 path is used: the
    feature patch seeds the generator's initial block and per-frame style
    codes (params['style'][frame_id]) condition each layer
    (train_ddp.py:742,826: all_z lookup by frame id)."""
    tx = make_neural2d_optimizer(cfg)
    C = cfg.agg.shading_color_channel_num

    import math
    n_layers = (int(math.log2(generator.image_size) - 6)
                if generator is not None else 0)

    def loss_fn(params, st, grid, batch: RayBatch, gt_rgb, frame_id, key):
        from .optim import freeze_points
        out = render_rays(params["mlp"],
                          freeze_points(params["points"], cfg.points),
                          st, grid, batch, cfg, key=key, train=True)
        feat_img = out.coarse_raycolor.reshape(1, patch, patch, C)
        if generator is not None:
            z = params["style"][frame_id]                   # [z_dim]
            w = vectorizer.apply({"params": params["stylevec"]}, z[None])
            styles = jnp.repeat(w[:, None, :], n_layers, axis=1)
            rgb = generator.apply({"params": params["head"]}, styles,
                                  feat_img)[0]
        else:
            rgb = head.apply({"params": params["head"]}, feat_img)[0]
        loss = jnp.mean((rgb - gt_rgb) ** 2)
        items = {"loss_total": loss, "psnr": mse2psnr(loss)}
        return loss, items

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: Neural2DState, st: PointCloudStatic, grid: PointGrid,
             batch: RayBatch, gt_rgb: jnp.ndarray,
             frame_id: jnp.ndarray):
        key, sub = jax.random.split(state.key)
        (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, st, grid, batch, gt_rgb, frame_id, sub)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return Neural2DState(params=new_params, opt_state=new_opt,
                             step=state.step + 1, key=key), items

    return step


def create_neural2d_state(key, agg_params, pc: PointCloud, head_params,
                          cfg: PointNeRFConfig,
                          style_codes: Optional[jnp.ndarray] = None,
                          stylevec_params=None) -> Neural2DState:
    params = {"mlp": agg_params, "points": pc, "head": head_params}
    if style_codes is not None:
        params["style"] = style_codes          # [n_frames, z_dim]
        params["stylevec"] = stylevec_params
    tx = make_neural2d_optimizer(cfg)
    return Neural2DState(params=params, opt_state=tx.init(params),
                         step=jnp.asarray(0, jnp.int32), key=key)
