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
