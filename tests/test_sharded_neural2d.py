"""2D neural-render head training under shard_map (VERDICT r4 stretch #9).

The CNN recon head (fork waymo mode, train_ddp.py:747-804 DDP semantics)
rides the (dp, mp) mesh: each dp row owns one whole feature patch, mp
shards the points, the head input assembles via a tiled all_gather over mp.
Checks (virtual 8-device CPU mesh):
 - (1, 2) mesh loss parity vs the single-device neural2d step (jitter off);
 - (2, 2) mesh training over two distinct patches reduces the loss.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.neural_render import NeuralRenderer
from pointnerf_tpu.models.points import make_point_cloud
from pointnerf_tpu.models.renderer import RayBatch
from pointnerf_tpu.parallel import (build_sharded_scene,
                                    create_sharded_neural2d_state,
                                    make_mesh, make_sharded_neural2d_step,
                                    partition_points)
from pointnerf_tpu.train.neural2d import (create_neural2d_state,
                                          make_neural2d_step)
from pointnerf_tpu.train.step import refresh_grid

from test_neural2d import PATCH, C_FEAT, patch_batch
from test_render import synthetic_scene


def n2d_sharded_cfg():
    cfg = tiny_test_config()
    return cfg.replace(
        agg=dataclasses.replace(cfg.agg, shading_color_channel_num=C_FEAT),
        query=dataclasses.replace(cfg.query, shell_layered=False, P=128),
        render=dataclasses.replace(cfg.render, train_jitter=0.0))


def _setup(cfg, mp):
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pc1, st1 = make_point_cloud(xyz, k1, cfg.points,
                                cfg.agg.point_features_dim, capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    head = NeuralRenderer(n_feat=16, input_dim=C_FEAT, img_size=32,
                          min_feat=8)
    hp = head.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, PATCH, PATCH, C_FEAT)))["params"]
    feats = np.asarray(pc1.features[:400])
    pc_s, num_active = partition_points(
        xyz, k1, cfg, mp=mp, features=feats,
        color=np.asarray(pc1.color[:400]), dirs=np.asarray(pc1.dirs[:400]),
        conf=np.asarray(pc1.conf[:400]))
    return (xyz, campos, camrot, pc1, st1, params, head, hp, pc_s,
            num_active)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_neural2d_matches_unsharded():
    """3-step loss parity on a (1, 2) mesh: step k's loss is computed from
    the params AFTER k updates, so agreement past step 0 validates the
    sharded gradient normalization (all_gather-transpose cotangent
    redundancy vs the pmean factors), not just the forward."""
    cfg = n2d_sharded_cfg()
    (xyz, campos, camrot, pc1, st1, params, head, hp, pc_s,
     num_active) = _setup(cfg, mp=2)
    batch, gt = patch_batch(campos, camrot)

    # build the sharded state FIRST: the reference step donates its state,
    # which shares the params/hp arrays
    mesh = make_mesh(dp=1, mp=2)
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_neural2d_state(
        jax.random.PRNGKey(7), params, pc_s, hp, scene, cfg, mesh)
    step = make_sharded_neural2d_step(cfg, mesh, head, PATCH)

    grid1 = refresh_grid(pc1, st1, cfg)
    # fresh copies for the reference: its step DONATES its state, and the
    # mesh device_put above aliases the source buffer for device 0 — donating
    # shared buffers would delete a shard of the mesh-placed params
    params2, hp2 = jax.tree.map(jnp.array, (params, hp))
    ref_state = create_neural2d_state(jax.random.PRNGKey(7), params2, pc1,
                                      hp2, cfg)
    ref_step = make_neural2d_step(cfg, head, PATCH)

    for k in range(3):
        ref_state, ref_items = ref_step(ref_state, st1, grid1, batch, gt,
                                        jnp.asarray(0, jnp.int32))
        state, items = step(state, scene, batch, gt[None])
        np.testing.assert_allclose(float(items["loss_total"]),
                                   float(ref_items["loss_total"]),
                                   rtol=2e-3, atol=2e-5, err_msg=f"step {k}")


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_neural2d_trains():
    cfg = n2d_sharded_cfg()
    (xyz, campos, camrot, pc1, st1, params, head, hp, pc_s,
     num_active) = _setup(cfg, mp=2)
    b0, gt0 = patch_batch(campos, camrot, seed=0)
    b1, gt1 = patch_batch(campos, camrot, seed=1)
    batch = RayBatch(
        campos=b0.campos, camrotc2w=b0.camrotc2w,
        raydir=jnp.concatenate([b0.raydir, b1.raydir]),
        pixel_idx=jnp.concatenate([b0.pixel_idx, b1.pixel_idx]),
        near=b0.near, far=b0.far, gt_image=None)
    gts = jnp.stack([gt0, gt1])

    mesh = make_mesh(dp=2, mp=2)
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_neural2d_state(
        jax.random.PRNGKey(7), params, pc_s, hp, scene, cfg, mesh)
    step = make_sharded_neural2d_step(cfg, mesh, head, PATCH)
    losses = []
    for _ in range(40):
        state, items = step(state, scene, batch, gts)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    # same bar as the unsharded test_cnn_head_trains (40 steps, -10%)
    assert losses[-1] < losses[0] * 0.9, losses[::10]
