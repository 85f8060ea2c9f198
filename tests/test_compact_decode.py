"""Parity of the static-capacity compacted decode (QueryConfig.decode_capacity)
against the dense masked decode.

The compacted path must reproduce the dense path exactly: same render outputs,
same losses, same gradients (the reference's dynamic boolean compaction,
point_aggregators.py:522-534, is semantically a no-op on results — ours must
be too). Overflow (capacity < valid slots) drops the trailing valid slots,
which must render as background and be counted in decode_dropped.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.losses import compute_losses
from pointnerf_tpu.models.renderer import decode_slots, render_rays
from pointnerf_tpu.train.step import (create_train_state, eval_step,
                                      refresh_grid, train_step)

from test_render import make_batch, setup, synthetic_scene  # noqa: F401


def _cap(cfg, frac):
    return cfg.replace(query=dataclasses.replace(cfg.query,
                                                 decode_capacity=frac))


def _outputs(cfg, pc, st, params, grid, batch, key=None):
    out = render_rays(params, pc, st, grid, batch, cfg, key=key,
                      train=key is not None)
    total, items = compute_losses(out, batch.gt_image, cfg.loss)
    return out, total, items


@pytest.mark.parametrize("frac", [1.0, 0.35])
def test_compact_matches_dense(frac):
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=96)
    p = {"mlp": params, "points": pc}

    dense, t0, it0 = _outputs(cfg, pc, st, params, grid, batch)
    ccfg = _cap(cfg, frac)
    comp, t1, it1 = _outputs(ccfg, pc, st, params, grid, batch)

    assert int(comp.decode_dropped) == 0
    np.testing.assert_allclose(np.asarray(comp.coarse_raycolor),
                               np.asarray(dense.coarse_raycolor),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.coarse_depth),
                               np.asarray(dense.coarse_depth),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.coarse_point_opacity),
                               np.asarray(dense.coarse_point_opacity),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(comp.ray_mask),
                                  np.asarray(dense.ray_mask))
    np.testing.assert_array_equal(np.asarray(comp.ray_valid),
                                  np.asarray(dense.ray_valid))
    np.testing.assert_allclose(np.asarray(comp.weight),
                               np.asarray(dense.weight), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.conf_coefficient),
                               np.asarray(dense.conf_coefficient),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(t1), float(t0), rtol=1e-6)


def test_compact_gradient_parity():
    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=96)

    def loss_of(cfg):
        def f(p):
            out = render_rays(p["mlp"], p["points"], st, grid, batch, cfg)
            total, _ = compute_losses(out, batch.gt_image, cfg.loss)
            return total
        return f

    p = {"mlp": params, "points": pc}
    g_dense = jax.grad(loss_of(cfg))(p)
    g_comp = jax.grad(loss_of(_cap(cfg, 0.5)))(p)
    flat_d, _ = jax.tree_util.tree_flatten(g_dense)
    flat_c, treedef = jax.tree_util.tree_flatten(g_comp)
    for a, b in zip(flat_d, flat_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)


def test_overflow_drops_to_background():
    """Capacity below the valid count: dropped slots render as background and
    decode_dropped reports how many (counted on the pre-KNN shading mask,
    which is what the compaction selects on)."""
    from pointnerf_tpu.config import effective_ray_generator
    from pointnerf_tpu.ops.query import generate_shading_points

    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=96)

    _loc, pre_mask = generate_shading_points(
        grid, batch.campos, batch.raydir, float(cfg.render.near_plane),
        float(cfg.render.far_plane), cfg.query,
        gen_name=effective_ray_generator(cfg))
    n_pre = int(jnp.sum(pre_mask))
    assert n_pre > 0

    # decode_slots floors at 512 slots; shrink to force overflow
    ccfg = _cap(cfg, 512.5 / (96 * cfg.query.SR))
    C = decode_slots(ccfg, 96 * cfg.query.SR)
    comp = render_rays(params, pc, st, grid, batch, ccfg)
    dropped = int(comp.decode_dropped)
    assert dropped == max(0, n_pre - C)
    # only kept slots can carry shading
    assert int(jnp.sum(comp.ray_valid)) <= min(C, n_pre)
    assert np.isfinite(np.asarray(comp.coarse_raycolor)).all()


def test_compact_training_step_runs():
    """train_step end-to-end with compaction on: loss decreases and state
    stays finite (uses the same schedule as the dense smoke test)."""
    cfg = _cap(tiny_test_config(), 0.5)
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=96)
    state = create_train_state(jax.random.PRNGKey(0), params, pc, cfg)
    losses = []
    for _ in range(12):
        state, items = train_step(state, st, grid, batch, cfg)
        losses.append(float(items["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    out = eval_step(state.params, st, grid, batch, cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_compact_matches_single_chip():
    """The sharded compacted path (per-ray-block compaction, compact
    all_to_all) must match the single-chip compacted render exactly when no
    block overflows."""
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from pointnerf_tpu.parallel import (build_sharded_scene,
                                        create_sharded_train_state,
                                        make_mesh, make_sharded_eval_step,
                                        make_sharded_train_step,
                                        partition_points)
    from test_render import synthetic_scene

    cfg = _cap(tiny_test_config(), 0.5)
    cfg = cfg.replace(query=dataclasses.replace(
        cfg.query, shell_layered=False, P=128))
    xyz, campos, camrot = synthetic_scene(n_pts=400)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    pc1, st1 = make_point_cloud(xyz, k1, cfg.points,
                                cfg.agg.point_features_dim, capacity=512)
    params = init_aggregator_params(k2, cfg.agg)
    grid1 = refresh_grid(pc1, st1, cfg)
    batch = make_batch(campos, camrot, R=64)
    ref = eval_step({"mlp": params, "points": pc1}, st1, grid1, batch, cfg)

    mesh = make_mesh(dp=4, mp=2)
    n = xyz.shape[0]
    pc_s, num_active = partition_points(
        xyz, k1, cfg, mp=2, features=np.asarray(pc1.features[:n]),
        color=np.asarray(pc1.color[:n]), dirs=np.asarray(pc1.dirs[:n]),
        conf=np.asarray(pc1.conf[:n]))
    scene = build_sharded_scene(pc_s, num_active, cfg, mesh)
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(9), params, pc_s, scene, cfg, mesh)
    out = make_sharded_eval_step(cfg, mesh)(state.params, scene, batch)

    np.testing.assert_array_equal(np.asarray(out.ray_mask),
                                  np.asarray(ref.ray_mask))
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.weight),
                               np.asarray(ref.weight), rtol=2e-4, atol=2e-4)

    # training: several steps run, loss falls, overflow metric reports 0
    step = make_sharded_train_step(cfg, mesh)
    losses, dropped = [], []
    for _ in range(6):
        state, items = step(state, scene, batch)
        losses.append(float(items["loss_total"]))
        dropped.append(float(items["n_decode_dropped"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert max(dropped) == 0.0
