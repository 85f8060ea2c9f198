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


# --------------------------------------------------------------------------
# Adversarial training (StyleGAN2 machinery, stylegan2_pytorch.py:698+)
# --------------------------------------------------------------------------

def diff_augment(key, imgs: jnp.ndarray, prob: float) -> jnp.ndarray:
    """Differentiable augmentation before the discriminator
    (AugWrapper.forward + DiffAugment 'translation'/'cutout' + random hflip,
    stylegan2_pytorch.py:392-404,386-389). imgs: [B, H, W, C] in [0,1].

    With probability `prob` (one draw per batch, like the reference's
    `if random() < prob`): hflip with p=0.5, translate by up to ±H/8 with
    zero padding, and cut out one H/2 square at a random position."""
    B, H, W, C = imgs.shape
    k_on, k_flip, k_tx, k_ty, k_cx, k_cy = jax.random.split(key, 6)

    def augmented(imgs):
        flip = jax.random.bernoulli(k_flip)
        imgs = jnp.where(flip, imgs[:, :, ::-1, :], imgs)
        # translation: pad by s then dynamic-slice at a random offset
        s = max(H // 8, 1)
        tx = jax.random.randint(k_tx, (), 0, 2 * s + 1)
        ty = jax.random.randint(k_ty, (), 0, 2 * s + 1)
        padded = jnp.pad(imgs, ((0, 0), (s, s), (s, s), (0, 0)))
        imgs = jax.lax.dynamic_slice(padded, (0, ty, tx, 0), (B, H, W, C))
        # cutout: zero a H/2 x W/2 square
        ch = max(H // 2, 1)
        cx = jax.random.randint(k_cx, (), 0, W - ch + 1)
        cy = jax.random.randint(k_cy, (), 0, H - ch + 1)
        yy = jnp.arange(H)[:, None]
        xx = jnp.arange(W)[None, :]
        hole = ((yy >= cy) & (yy < cy + ch) & (xx >= cx) & (xx < cx + ch))
        return imgs * (1.0 - hole[None, :, :, None].astype(imgs.dtype))

    on = jax.random.bernoulli(k_on, prob)
    return jax.lax.cond(on, augmented, lambda x: x, imgs)


def hinge_d_loss(real_logits, fake_logits):
    """D objective (hinge_loss :301-302; note the reference's inverted sign
    convention: D pushes real logits <= -1 and fake logits >= +1)."""
    return jnp.mean(jax.nn.relu(1.0 + real_logits)) + \
        jnp.mean(jax.nn.relu(1.0 - fake_logits))


def hinge_g_loss(fake_logits):
    """G objective (gen_hinge_loss :298-299): minimize the fake logit."""
    return jnp.mean(fake_logits)


def gradient_penalty(d_apply, d_params, images, weight: float = 10.0):
    """R1-style penalty pushing |grad D(real)| toward 1 every gp_every steps
    (gradient_penalty :234-241)."""
    def scalar_out(img):
        return jnp.sum(d_apply(d_params, img))
    g = jax.grad(scalar_out)(images)
    norms = jnp.sqrt(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=-1) + 1e-12)
    return weight * jnp.mean((norms - 1.0) ** 2)


class GANTrainState(NamedTuple):
    params: Dict[str, Any]      # generator side {"mlp","points","head",...}
    g_opt_state: Any
    d_params: Any               # discriminator flax params
    d_opt_state: Any
    ema: Dict[str, Any]         # EMA copies of {"head"[, "stylevec"]}
    step: jnp.ndarray
    key: jnp.ndarray


def make_gan_step(cfg: PointNeRFConfig, head, patch: int, disc,
                  generator: Optional[Generator] = None,
                  vectorizer: Optional[StyleVectorizer] = None,
                  recon_weight: float = 1.0, gan_weight: float = 1.0,
                  aug_prob: float = 0.5, gp_every: int = 4,
                  gp_weight: float = 10.0, ema_beta: float = 0.995,
                  d_lr: float = 2e-4):
    """Adversarial step for the 2D neural-render head: D hinge update (with
    DiffAugment and periodic gradient penalty), then G update (reconstruction
    + hinge adversarial) against the freshly updated D, then EMA of the head.
    Mirrors Trainer.train (stylegan2_pytorch.py:963-1136) with both halves in
    one jitted call; the reference's sequential D-then-G order is preserved.
    Deviation (documented): EMA runs from step 0 (the reference starts
    copying at 20k steps, :1139-1141) and the pl-length path penalty is not
    implemented (off by default upstream for this fork's use)."""
    tx = make_neural2d_optimizer(cfg)
    d_tx = optax.adam(d_lr, b1=0.5, b2=0.9)
    C = cfg.agg.shading_color_channel_num

    import math
    n_layers = (int(math.log2(generator.image_size) - 6)
                if generator is not None else 0)

    def gen_rgb(params, st, grid, batch, frame_id, key):
        from .optim import freeze_points
        out = render_rays(params["mlp"],
                          freeze_points(params["points"], cfg.points),
                          st, grid, batch, cfg, key=key, train=True)
        feat_img = out.coarse_raycolor.reshape(1, patch, patch, C)
        if generator is not None:
            z = params["style"][frame_id]
            w = vectorizer.apply({"params": params["stylevec"]}, z[None])
            styles = jnp.repeat(w[:, None, :], n_layers, axis=1)
            return generator.apply({"params": params["head"]}, styles,
                                   feat_img)
        return head.apply({"params": params["head"]}, feat_img)

    def d_apply(d_params, img):
        return disc.apply({"params": d_params}, img)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: GANTrainState, st: PointCloudStatic, grid: PointGrid,
             batch: RayBatch, gt_rgb: jnp.ndarray, frame_id: jnp.ndarray):
        key, k_render, k_aug_d, k_aug_g, k_render2 = jax.random.split(
            state.key, 5)

        # ---- discriminator update (fake detached, :1043-1081) ----
        fake = jax.lax.stop_gradient(
            gen_rgb(state.params, st, grid, batch, frame_id, k_render))
        real = gt_rgb[None]

        def d_loss_fn(d_params):
            f_log = d_apply(d_params, diff_augment(k_aug_d, fake, aug_prob))
            r_log = d_apply(d_params, diff_augment(k_aug_d, real, aug_prob))
            div = hinge_d_loss(r_log, f_log)
            gp = jax.lax.cond(
                state.step % gp_every == 0,
                lambda: gradient_penalty(d_apply, d_params, real, gp_weight),
                lambda: jnp.float32(0.0))
            return div + gp, (div, gp)

        (d_total, (d_div, gp)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state,
                                           state.d_params)
        new_d = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update against the NEW D (:1084-1133) ----
        def g_loss_fn(params):
            rgb = gen_rgb(params, st, grid, batch, frame_id, k_render2)
            recon = jnp.mean((rgb[0] - gt_rgb) ** 2)
            adv = hinge_g_loss(
                d_apply(new_d, diff_augment(k_aug_g, rgb, aug_prob)))
            return recon_weight * recon + gan_weight * adv, (recon, adv)

        (g_total, (recon, adv)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params)
        g_updates, new_g_opt = tx.update(g_grads, state.g_opt_state,
                                         state.params)
        new_params = optax.apply_updates(state.params, g_updates)

        # ---- EMA of the style head (EMA :59-66, :754-758) ----
        tracked = {k: new_params[k] for k in state.ema}
        new_ema = jax.tree.map(lambda e, p: ema_beta * e + (1 - ema_beta) * p,
                               state.ema, tracked)

        items = {"loss_total": g_total, "loss_recon": recon,
                 "loss_g_adv": adv, "loss_d": d_div, "loss_gp": gp,
                 "psnr": mse2psnr(recon)}
        return GANTrainState(params=new_params, g_opt_state=new_g_opt,
                             d_params=new_d, d_opt_state=new_d_opt,
                             ema=new_ema, step=state.step + 1, key=key), items

    return step


def create_gan_state(key, agg_params, pc: PointCloud, head_params,
                     d_params, cfg: PointNeRFConfig,
                     style_codes: Optional[jnp.ndarray] = None,
                     stylevec_params=None,
                     d_lr: float = 2e-4) -> GANTrainState:
    params = {"mlp": agg_params, "points": pc, "head": head_params}
    # EMA starts as a deep COPY: params and ema live in one donated state, so
    # sharing buffers would double-donate on the first step
    ema = {"head": jax.tree.map(jnp.copy, head_params)}
    if style_codes is not None:
        params["style"] = style_codes
        params["stylevec"] = stylevec_params
        ema["stylevec"] = jax.tree.map(jnp.copy, stylevec_params)
    tx = make_neural2d_optimizer(cfg)
    d_tx = optax.adam(d_lr, b1=0.5, b2=0.9)
    return GANTrainState(params=params, g_opt_state=tx.init(params),
                         d_params=d_params, d_opt_state=d_tx.init(d_params),
                         ema=ema, step=jnp.asarray(0, jnp.int32), key=key)
