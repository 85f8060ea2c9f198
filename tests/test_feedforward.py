"""Feed-forward (generalization) training: MVS -> points -> render, with
gradients reaching the MVS networks (reference run/train.py mode 0)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import (AggregatorConfig, PointNeRFConfig,
                                  QueryConfig, RenderConfig, TrainConfig)
from pointnerf_tpu.data.synthetic import ring_cameras, view_ray_batch
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.renderer import RayBatch
from pointnerf_tpu.mvs.points_init import (MvsPointsInit, init_mvs_points,
                                           view_proj_mats)
from pointnerf_tpu.train.feedforward import (MVSBatch, create_ff_state,
                                             make_feedforward_step)


def ff_cfg():
    return PointNeRFConfig(
        query=QueryConfig(vsize=(0.1, 0.1, 0.1), vscale=(2.0, 2.0, 2.0),
                          max_o=2048, P=8, K=4, SR=12, z_depth_dim=48,
                          ranges=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0),
                          knn_chunk=4096),
        agg=AggregatorConfig(point_features_dim=8, shading_feature_num=32,
                             num_feat_freqs=2, dist_xyz_freq=3,
                             num_pos_freqs=4, num_viewdir_freqs=2),
        render=RenderConfig(near_plane=2.0, far_plane=4.5),
        train=TrainConfig(random_sample_size=8))


def make_mvs_batch(cfg, wh=(32, 32), n_rays=64, seed=0):
    V = 3
    views = ring_cameras(n_views=V + 1, wh=wh, focal=float(wh[0]))
    images, Ks, w2cs = [], [], []
    for campos, rot, K in views[:V]:
        item = view_ray_batch(campos, rot, K, wh)
        images.append(item["gt_image"].reshape(wh[1], wh[0], 3))
        Ks.append(K)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = rot.T
        w2c[:3, 3] = -rot.T @ campos
        w2cs.append(w2c)
    images, Ks, w2cs = np.stack(images), np.stack(Ks), np.stack(w2cs)
    target = view_ray_batch(*views[V], wh, n_rays=n_rays, seed=seed)
    rays = RayBatch(
        campos=jnp.asarray(target["campos"]),
        camrotc2w=jnp.asarray(target["camrotc2w"]),
        raydir=jnp.asarray(target["raydir"]),
        pixel_idx=jnp.asarray(target["pixel_idx"], jnp.int32),
        near=jnp.asarray(cfg.render.near_plane),
        far=jnp.asarray(cfg.render.far_plane),
        gt_image=jnp.asarray(target["gt_image"]))
    return MVSBatch(images=jnp.asarray(images),
                    proj_mats=jnp.asarray(view_proj_mats(Ks, w2cs, 0)),
                    Ks=jnp.asarray(Ks), w2cs=jnp.asarray(w2cs),
                    depth_values=jnp.linspace(2.0, 4.5, 16),
                    rays=rays)


def test_feedforward_step_trains_mvs():
    cfg = ff_cfg()
    model = MvsPointsInit(point_features_dim=cfg.agg.point_features_dim)
    variables = init_mvs_points(model, jax.random.PRNGKey(0), V=3, H=32, W=32)
    agg_params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    state = create_ff_state(jax.random.PRNGKey(2), variables, agg_params, cfg)
    step, infer_cloud = make_feedforward_step(cfg, model, capacity=128)

    mvs_before = jax.tree.map(np.asarray, state.params["mvs"])
    losses = []
    for i in range(5):
        batch = make_mvs_batch(cfg, seed=i)
        state, items = step(state, batch)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all(), losses

    # MVS network parameters must have moved (end-to-end gradient flow)
    moved = 0
    for a, b in zip(jax.tree.leaves(mvs_before),
                    jax.tree.leaves(state.params["mvs"])):
        if np.abs(np.asarray(b) - a).max() > 0:
            moved += 1
    assert moved > 0, "no gradient reached the MVS nets"

    # zero-shot cloud generation on a fresh batch
    pc, st = infer_cloud(state.params, state.mvs_stats,
                         make_mvs_batch(cfg, seed=99))
    assert int(st.num_active) == 64  # 8x8 quarter-res pixels
    assert np.isfinite(np.asarray(pc.xyz[:64])).all()
