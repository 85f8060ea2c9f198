"""Feature-render + 2D decoder training (fork waymo mode): both CNN and
StyleGAN2 heads learn on the synthetic scene."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.neural_render import (Generator, NeuralRenderer,
                                                StyleVectorizer)
from pointnerf_tpu.models.points import make_point_cloud
from pointnerf_tpu.models.renderer import RayBatch
from pointnerf_tpu.train.neural2d import (create_neural2d_state,
                                          make_neural2d_step)
from pointnerf_tpu.train.step import refresh_grid

from test_render import synthetic_scene
from pointnerf_tpu.camera import get_dtu_raydir


PATCH = 16
C_FEAT = 16


def feat_cfg():
    cfg = tiny_test_config()
    return cfg.replace(agg=dataclasses.replace(
        cfg.agg, shading_color_channel_num=C_FEAT))


def patch_batch(campos, camrot, seed=0):
    rng = np.random.RandomState(seed)
    intr = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)
    x0, y0 = rng.randint(0, 64 - PATCH, 2)
    gx, gy = np.meshgrid(np.arange(x0, x0 + PATCH), np.arange(y0, y0 + PATCH))
    pix = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    raydir = get_dtu_raydir(pix, intr, camrot, True).astype(np.float32)
    gt_rgb = np.tile(np.array([0.2, 0.5, 0.8], np.float32),
                     (PATCH, PATCH, 1))
    return RayBatch(campos=jnp.asarray(campos), camrotc2w=jnp.asarray(camrot),
                    raydir=jnp.asarray(raydir),
                    pixel_idx=jnp.asarray(pix, jnp.int32),
                    near=jnp.asarray(2.0), far=jnp.asarray(4.5),
                    gt_image=None), jnp.asarray(gt_rgb)


def setup_scene(cfg):
    xyz, campos, camrot = synthetic_scene()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    grid = refresh_grid(pc, st, cfg)
    return pc, st, params, grid, campos, camrot


def test_cnn_head_trains():
    cfg = feat_cfg()
    pc, st, params, grid, campos, camrot = setup_scene(cfg)
    head = NeuralRenderer(n_feat=16, input_dim=C_FEAT, img_size=32, min_feat=8)
    batch, gt = patch_batch(campos, camrot)
    hp = head.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, PATCH, PATCH, C_FEAT)))["params"]
    state = create_neural2d_state(jax.random.PRNGKey(2), params, pc, hp, cfg)
    step = make_neural2d_step(cfg, head, PATCH)
    losses = []
    for i in range(40):
        state, items = step(state, st, grid, batch, gt, jnp.asarray(0))
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def test_stylegan_head_trains():
    cfg = feat_cfg()
    pc, st, params, grid, campos, camrot = setup_scene(cfg)
    # image_size 256 -> 2 layers; initial res = patch = 128? keep tiny:
    # image_size 128 -> n_layers=1, initial at 128/1=... use 256/2 blocks
    img_size = 2 * PATCH  # one upsample
    gen = Generator(image_size=128, latent_dim=8, network_capacity=4,
                    init_channels=C_FEAT)
    vec = StyleVectorizer(emb=8, depth=2)
    n_layers = 1
    styles0 = jnp.zeros((1, n_layers, 8))
    gp = gen.init(jax.random.PRNGKey(1), styles0,
                  jnp.zeros((1, PATCH, PATCH, C_FEAT)))["params"]
    vp = vec.init(jax.random.PRNGKey(2), jnp.zeros((1, 8)))["params"]
    z0_np = np.random.RandomState(3).randn(2, 8).astype(np.float32)
    z_codes = jnp.asarray(z0_np)
    state = create_neural2d_state(jax.random.PRNGKey(4), params, pc, gp, cfg,
                                  style_codes=z_codes, stylevec_params=vp)
    step = make_neural2d_step(cfg, None, PATCH, generator=gen, vectorizer=vec)
    batch, _ = patch_batch(campos, camrot)
    gt = jnp.asarray(np.tile(np.array([0.6, 0.3, 0.1], np.float32),
                             (PATCH, PATCH, 1)))
    losses = []
    for i in range(15):
        state, items = step(state, st, grid, batch, gt, jnp.asarray(1))
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[::5]
    # style codes are trainable per frame: frame 1 moved, frame 0 untouched
    z = np.asarray(state.params["style"])
    assert np.abs(z[1] - z0_np[1]).max() > 0
    np.testing.assert_array_equal(z[0], z0_np[0])

def test_gan_step_trains_d_and_g():
    """VERDICT r1 #8: adversarial machinery for the StyleGAN2 head — D hinge
    update with DiffAugment + periodic gradient penalty, G update against the
    fresh D, EMA of the head. Smoke: losses finite, D loss moves, EMA drifts
    from init, recon still improves."""
    from pointnerf_tpu.models.neural_render import Discriminator
    from pointnerf_tpu.train.neural2d import (create_gan_state,
                                              make_gan_step)
    cfg = feat_cfg()
    pc, st, params, grid, campos, camrot = setup_scene(cfg)
    gen = Generator(image_size=128, latent_dim=8, network_capacity=4,
                    init_channels=C_FEAT)
    vec = StyleVectorizer(emb=8, depth=2)
    disc = Discriminator(image_size=PATCH, network_capacity=2)
    styles0 = jnp.zeros((1, 1, 8))
    gp = gen.init(jax.random.PRNGKey(1), styles0,
                  jnp.zeros((1, PATCH, PATCH, C_FEAT)))["params"]
    vp = vec.init(jax.random.PRNGKey(2), jnp.zeros((1, 8)))["params"]
    dp = disc.init(jax.random.PRNGKey(3),
                   jnp.zeros((1, PATCH, PATCH, 3)))["params"]
    z_codes = jnp.asarray(np.random.RandomState(4).randn(2, 8), jnp.float32)
    init_leaf = np.array(jax.tree.leaves(gp)[0])  # snapshot before donation
    state = create_gan_state(jax.random.PRNGKey(5), params, pc, gp, dp, cfg,
                             style_codes=z_codes, stylevec_params=vp)
    step = make_gan_step(cfg, None, PATCH, disc, generator=gen,
                         vectorizer=vec, aug_prob=0.5, gp_every=2)
    batch, _ = patch_batch(campos, camrot)
    gt = jnp.asarray(np.tile(np.array([0.6, 0.3, 0.1], np.float32),
                             (PATCH, PATCH, 1)))
    d_losses, recons, gps = [], [], []
    for i in range(12):
        state, items = step(state, st, grid, batch, gt, jnp.asarray(1))
        d_losses.append(float(items["loss_d"]))
        recons.append(float(items["loss_recon"]))
        gps.append(float(items["loss_gp"]))
    assert np.isfinite(d_losses).all() and np.isfinite(recons).all()
    # D loss moves under training and stays below the untrained hinge value
    # of 2.0 (recon simultaneously makes fakes harder, so monotone descent
    # is not expected at this scale)
    assert max(d_losses) - min(d_losses) > 0.01, d_losses
    assert d_losses[-1] < 2.0, d_losses
    # gradient penalty fires on the gp_every cadence only
    assert gps[0] > 0.0 and gps[1] == 0.0
    # reconstruction still improves under the combined objective
    assert recons[-1] < recons[0]
    # EMA drifted from init but is not equal to the live params
    ema_leaf = jax.tree.leaves(state.ema["head"])[0]
    live_leaf = jax.tree.leaves(state.params["head"])[0]
    assert not np.allclose(np.asarray(ema_leaf), np.asarray(live_leaf))
    assert not np.array_equal(np.asarray(ema_leaf), init_leaf)
