"""Loss engine — masked-static reimplementation of
BaseRenderingModel.compute_losses (models/base_rendering_model.py:533-664).

Name-prefix dispatch is preserved: `ray_masked_X` restricts the L2 to rays the
query hit, `ray_miss_X` to missed rays (weighted by the miss count, :560),
plain names use all rays. The zero-one regularizer pushes conf toward {0,1}
(:630-641); the sparse loss follows :652-661.

Deviation (documented): the reference computes the zero-one / sparse terms
over every (ray, sample, K) slot of the *compacted* ray set — invalid slots
gather point 0's conf (neural_points.py:790). We mask to valid neighbor slots
instead, which regularizes exactly the confidences that contributed to
rendering.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

from ..config import LossConfig
from .renderer import RenderOutput


def _masked_mse(pred, gt, mask):
    """Mean squared error over rows where mask is True (rows are [..., C])."""
    m = mask.astype(pred.dtype)[..., None]
    num = jnp.sum(m) * pred.shape[-1]
    return jnp.sum(m * (pred - gt) ** 2) / jnp.clip(num, min=1.0)


def compute_losses(out: RenderOutput, gt_image: jnp.ndarray,
                   cfg: LossConfig, gt_depth=None, bg_color=None
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, per-item dict). gt_image: [R, 3];
    gt_depth (optional): [R] or [R,1] for depth_loss_items;
    bg_color (optional): [3] for bg_loss_items."""
    total = 0.0
    items: Dict[str, jnp.ndarray] = {}
    output = {"coarse_raycolor": out.coarse_raycolor}
    if out.fine_raycolor is not None:
        # hierarchical second pass (reference registers fine_raycolor in
        # color_loss_items when fine_sample_num > 0, _ori.py:77-78)
        output["fine_raycolor"] = out.fine_raycolor
    if out.nerf_coarse_raycolor is not None:
        # proposal-NeRF hybrid: aux supervision of the coarse radiance
        # field (reference output 'nerf_coarse_raycolor',
        # neural_points_volumetric_multiseq_model.py:336)
        output["nerf_coarse_raycolor"] = out.nerf_coarse_raycolor

    for name, wgt in zip(cfg.color_loss_items, cfg.color_loss_weights):
        if name.startswith("ray_masked_"):
            base = name[len("ray_masked_"):]
            loss = _masked_mse(output[base], gt_image, out.ray_mask)
        elif name.startswith("ray_miss_"):
            base = name[len("ray_miss_"):]
            miss = ~out.ray_mask
            n_miss = jnp.sum(miss.astype(jnp.float32))
            # reference multiplies the mean by the miss count (:560)
            loss = _masked_mse(output[base], gt_image, miss) * n_miss
        else:
            loss = jnp.mean((output[name] - gt_image) ** 2)
        items["loss_" + name] = loss
        total = total + loss * wgt + 1e-6  # +1e-6 per item, ref :603

    if gt_depth is not None:
        gt_d = gt_depth.reshape(-1, 1)
        for name, wgt in zip(cfg.depth_loss_items, cfg.depth_loss_weights):
            # ray_depth_masked_*: L2 on hit rays with valid GT depth
            # (base_rendering_model.py:565-571)
            base = (name[len("ray_depth_masked_"):]
                    if name.startswith("ray_depth_masked_") else name)
            assert base == "coarse_depth", base
            m = out.ray_mask & (gt_d[:, 0] > 0)
            loss = _masked_mse(out.coarse_depth, gt_d, m)
            items["loss_" + name] = loss
            total = total + loss * wgt

    if bg_color is not None and cfg.bg_loss_items:
        # GT background mask from color match (reference probe semantics,
        # run/train_ft.py:503: ||gt-bg|| > eps means foreground)
        is_bg = (jnp.linalg.norm(gt_image - bg_color.reshape(1, -1), axis=-1)
                 < cfg.bg_color_match_eps).astype(jnp.float32)[:, None]
        for name, wgt in zip(cfg.bg_loss_items, cfg.bg_loss_weights):
            assert name == "coarse_is_background", name
            loss = jnp.mean((out.coarse_is_background - is_bg) ** 2)
            items["loss_" + name] = loss
            total = total + loss * wgt

    for name, wgt in zip(cfg.zero_one_loss_items, cfg.zero_one_loss_weights):
        if name == "conf_coefficient":
            val = jnp.clip(out.conf_coefficient, cfg.zero_epsilon,
                           1.0 - cfg.zero_epsilon)
            valid = out.ray_valid[..., None] & (out.weight > 0)
            vf = valid.astype(val.dtype)
            loss = jnp.sum(vf * (jnp.log(val) + jnp.log(1.0 - val))) / jnp.clip(
                jnp.sum(vf), min=1.0)
            items["loss_" + name] = loss
            total = total + loss * wgt

    if cfg.sparse_loss_weight > 0:
        w = out.weight
        loss = jnp.sum(w * jnp.abs(1.0 - jnp.exp(-2.0 * out.conf_coefficient))) / (
            jnp.sum(w) + 1e-6)
        items["loss_sparse"] = loss
        total = total + loss * cfg.sparse_loss_weight

    return total, items


def mse2psnr(mse):
    return -10.0 * jnp.log10(jnp.clip(mse, min=1e-10))
