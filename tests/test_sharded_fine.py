"""Sharded hierarchical refinement (VERDICT r2 next #8).

The fine pass resamples shading locations from the coarse blend weights —
owning-shard data — so the sharded version all_gathers each block's fine
positions over mp before the usual KNN/all_to_all/decode flow
(parallel/sharded.py _fine_local). Deterministic eval must match the
single-chip render_rays fine output exactly (same positions, same KNN,
same decode — both fed by the identical coarse parity already pinned).
"""
import dataclasses

import numpy as np
import jax
import pytest

from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.points import make_point_cloud
from pointnerf_tpu.parallel import (build_sharded_scene,
                                    create_sharded_train_state, make_mesh,
                                    make_sharded_eval_step,
                                    make_sharded_train_step,
                                    partition_points)
from pointnerf_tpu.train.step import eval_step, refresh_grid

from test_parallel import sharded_cfg  # noqa: F401
from test_render import make_batch, synthetic_scene  # noqa: F401

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _fine_cfg(compact: bool):
    cfg = sharded_cfg()
    return cfg.replace(
        render=dataclasses.replace(cfg.render, fine_sample_num=8),
        query=dataclasses.replace(cfg.query,
                                  decode_capacity=0.5 if compact else 0.0))


def _setup(cfg):
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pc1, st1 = make_point_cloud(xyz, k1, cfg.points,
                                cfg.agg.point_features_dim, capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    mesh = make_mesh(dp=4, mp=2)
    n = xyz.shape[0]
    pc_s, num_active = partition_points(
        xyz, k1, cfg, mp=2, features=np.asarray(pc1.features[:n]),
        color=np.asarray(pc1.color[:n]), dirs=np.asarray(pc1.dirs[:n]),
        conf=np.asarray(pc1.conf[:n]))
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(9), params, pc_s, scene, cfg, mesh)
    return pc1, st1, params, mesh, state, scene, campos, camrot


@pytest.mark.parametrize("compact", [True, False])
def test_sharded_fine_matches_single_chip(compact):
    cfg = _fine_cfg(compact)
    pc1, st1, params, mesh, state, scene, campos, camrot = _setup(cfg)
    batch = make_batch(campos, camrot, R=64)

    ref = eval_step({"mlp": params, "points": pc1}, st1,
                    refresh_grid(pc1, st1, cfg), batch, cfg)
    assert ref.fine_raycolor is not None
    out = make_sharded_eval_step(cfg, mesh)(state.params, scene, batch)
    assert out.fine_raycolor is not None
    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.fine_raycolor),
                               np.asarray(ref.fine_raycolor),
                               rtol=5e-4, atol=5e-4)


def test_sharded_fine_training_step_runs_and_learns():
    cfg = _fine_cfg(compact=True)
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss,
        color_loss_items=("ray_masked_coarse_raycolor", "fine_raycolor"),
        color_loss_weights=(1.0, 1.0)))
    _, _, _, mesh, state, scene, campos, camrot = _setup(cfg)
    batch = make_batch(campos, camrot, R=64)
    step = make_sharded_train_step(cfg, mesh)
    losses = []
    for _ in range(6):
        state, items = step(state, scene, batch)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
