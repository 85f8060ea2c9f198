"""Parity of the sort+segment-sum payload-gather backward
(QueryConfig.gather_bwd="sort") against XLA's scatter-add backward.

The gather forward is identical by construction (table[idx] either way);
the custom backward must produce the same gradient up to f32 summation
order — including heavy index collisions (many lanes hitting one point),
which is exactly the case the sort formulation exists for.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.losses import compute_losses
from pointnerf_tpu.models.points import (_table_gather_sortbwd,
                                         gather_points, make_point_cloud)
from pointnerf_tpu.models.renderer import render_rays

from test_render import make_batch, setup, synthetic_scene  # noqa: F401


def _gb(cfg, mode):
    return cfg.replace(query=dataclasses.replace(cfg.query, gather_bwd=mode))


def test_table_gather_collision_gradients():
    """Duplicate-heavy indices: every row id appears many times."""
    rng = np.random.RandomState(0)
    n, m, w = 17, 400, 9
    table = jnp.asarray(rng.randn(n, w).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, size=(m,)), jnp.int32)
    ct_w = jnp.asarray(rng.randn(m, w).astype(np.float32))

    def loss_sort(t):
        return jnp.sum(_table_gather_sortbwd(t, idx) * ct_w)

    def loss_scatter(t):
        return jnp.sum(t[idx] * ct_w)

    g_sort = jax.grad(loss_sort)(table)
    g_scat = jax.grad(loss_scatter)(table)
    np.testing.assert_allclose(np.asarray(g_sort), np.asarray(g_scat),
                               rtol=1e-5, atol=1e-6)


def test_gather_points_forward_identical():
    cfg = tiny_test_config()
    rng = np.random.RandomState(1)
    xyz = rng.randn(64, 3).astype(np.float32)
    pc, _ = make_point_cloud(xyz, jax.random.PRNGKey(0), cfg.points,
                             cfg.agg.point_features_dim)
    xyz_pers = jnp.asarray(rng.randn(pc.capacity, 3).astype(np.float32))
    pidx = jnp.asarray(rng.randint(-1, 64, size=(5, 7, 4)), jnp.int32)
    a = gather_points(pc, xyz_pers, pidx, bwd="scatter")
    b = gather_points(pc, xyz_pers, pidx, bwd="sort")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_render_gradient_parity_sort_vs_scatter():
    """Full render + loss: gradients agree across backward formulations."""
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
    g_scat = jax.grad(loss_of(_gb(cfg, "scatter")))(p)
    g_sort = jax.grad(loss_of(_gb(cfg, "sort")))(p)
    flat_a, _ = jax.tree_util.tree_flatten(g_scat)
    flat_b, _ = jax.tree_util.tree_flatten(g_sort)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)
