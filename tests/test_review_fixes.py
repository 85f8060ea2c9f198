"""Regression tests for the round-1 code-review findings."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.renderer import render_rays
from pointnerf_tpu.train.step import eval_step, refresh_grid

from test_render import make_batch, setup, synthetic_scene


def _agg_cfg(**kw):
    cfg = tiny_test_config()
    return cfg.replace(agg=dataclasses.replace(cfg.agg, **kw))


def test_sh_intrp_kernel_renders():
    """sh_intrp was advertised but raised ValueError; the leading sh_degree²
    feature channels are SH coefficients now."""
    cfg = _agg_cfg(agg_distance_kernel="sh_intrp", sh_degree=2,
                   point_features_dim=8 + 4)  # 4 SH coeffs + 8 payload
    pc, st, params, grid, campos, camrot = setup(cfg)
    out = render_rays(params, pc, st, grid, make_batch(campos, camrot), cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()
    assert bool(jnp.any(out.ray_mask))


@pytest.mark.parametrize("mode_field", ["agg_feat_xyz_mode",
                                        "agg_alpha_xyz_mode",
                                        "agg_color_xyz_mode"])
def test_xyz_modes_render(mode_field):
    """*_xyz_mode sized the MLPs for a position encoding that was never
    concatenated -> shape crash; now the PE'd sample position feeds the
    corresponding branch."""
    cfg = _agg_cfg(**{mode_field: "absolute"})
    pc, st, params, grid, campos, camrot = setup(cfg)
    out = render_rays(params, pc, st, grid, make_batch(campos, camrot), cfg)
    assert np.isfinite(np.asarray(out.coarse_raycolor)).all()


def test_prefetcher_propagates_worker_errors():
    from pointnerf_tpu.train.driver import ItemPrefetcher

    def bad_item(step):
        raise ValueError("boom")

    p = ItemPrefetcher(bad_item, start_step=0)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        p.get()
    p.close()


def test_resume_after_capacity_growth(tmp_path):
    """Resume must rebuild the restore template at the checkpointed
    capacity when growth re-bucketed the cloud."""
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.checkpoint import (checkpoint_meta,
                                                latest_checkpoint,
                                                load_checkpoint,
                                                save_checkpoint)
    from pointnerf_tpu.train.grow import ProbeCandidates, apply_grow
    from pointnerf_tpu.train.step import create_train_state
    cfg = tiny_test_config()
    xyz, campos, camrot = synthetic_scene(n_pts=100)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=128)
    params = init_aggregator_params(k2, cfg.agg)
    state = create_train_state(k3, params, pc, cfg)
    F = cfg.agg.point_features_dim
    cand = ProbeCandidates(
        xyz=np.zeros((200, 3), np.float32),
        embedding=np.ones((200, F), np.float32),
        color=np.zeros((200, 3), np.float32),
        dirs=np.zeros((200, 3), np.float32),
        conf=np.full((200, 1), 0.3, np.float32))
    state, st, added = apply_grow(state, st, cand, cfg)
    assert state.params["points"].capacity > 128  # re-bucketed
    save_checkpoint(str(tmp_path), state,
                    {"num_active": int(st.num_active),
                     "capacity": state.params["points"].capacity})

    path = latest_checkpoint(str(tmp_path))
    meta = checkpoint_meta(path)
    assert meta["capacity"] == state.params["points"].capacity
    # rebuild template at checkpointed capacity and restore exactly
    pc2, _ = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=meta["capacity"])
    template = create_train_state(k3, params, pc2, cfg)
    restored, meta2 = load_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["points"].xyz),
        np.asarray(state.params["points"].xyz))


def test_prune_preserves_adam_moments():
    """apply_prune permutes per-point Adam moments with the points instead
    of resetting the optimizer (the reference loses all state on its
    prune-restart)."""
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.grow import apply_prune
    from pointnerf_tpu.train.step import create_train_state, refresh_grid, train_step
    from test_render import make_batch
    cfg = tiny_test_config()
    xyz, campos, camrot = synthetic_scene(n_pts=200)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=4096)
    params = init_aggregator_params(k2, cfg.agg)
    state = create_train_state(k3, params, pc, cfg)
    grid = refresh_grid(pc, st, cfg)
    batch = make_batch(campos, camrot)
    for _ in range(3):
        state, _ = train_step(state, st, grid, batch, cfg)

    # find a per-point moment leaf (shape [capacity, F])
    cap = state.params["points"].capacity
    moment_leaves = [l for l in jax.tree.leaves(state.opt_state)
                     if hasattr(l, "ndim") and l.ndim >= 1
                     and l.shape[0] == cap]
    assert moment_leaves, "no per-point moment leaves found"
    assert any(float(jnp.abs(l).max()) > 0 for l in moment_leaves), \
        "moments are all zero after training steps"

    # prune half by conf
    pc_now = state.params["points"]
    conf = pc_now.conf.at[:100, 0].set(0.0)
    state = state._replace(params=dict(state.params,
                                       points=pc_now._replace(conf=conf)))
    state2, st2, kept = apply_prune(state, st, cfg)
    assert kept == 100
    leaves2 = [l for l in jax.tree.leaves(state2.opt_state)
               if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == cap]
    # moments survive for the kept rows and the dead tail is zero
    assert any(float(jnp.abs(l[:kept]).max()) > 0 for l in leaves2)
    for l in leaves2:
        assert float(jnp.abs(l[kept:]).max()) == 0.0
    # and training continues fine
    grid2 = refresh_grid(state2.params["points"], st2, cfg)
    state3, items = train_step(state2, st2, grid2, batch, cfg)
    assert np.isfinite(float(items["loss_total"]))


def test_alternation_isolates_inactive_optimizer():
    """alter_step > 0 must match the reference's ALTERNATE optimizer
    stepping (_ori.py:210-217): the off-phase group's params AND its Adam
    state (moments + bias-correction count) stay untouched. A plain update
    mask is not enough — tx.update would fold off-phase gradients into the
    inactive group's moments (round-1 advisor finding, train/step.py)."""
    from pointnerf_tpu.config import jit_canonical
    from pointnerf_tpu.models.points import make_point_cloud
    from pointnerf_tpu.train.step import create_train_state, train_step
    cfg = tiny_test_config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, alter_step=1))
    xyz, campos, camrot = synthetic_scene()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=512)
    grid = refresh_grid(pc, st, cfg)
    state = create_train_state(k3, init_aggregator_params(k2, cfg.agg), pc,
                               cfg)
    batch = make_batch(campos, camrot)
    cfgj = jit_canonical(cfg)

    def snap(t):
        return jax.tree.map(lambda x: np.asarray(x).copy(), t)

    def same(a, b):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        return all(np.array_equal(x, y) for x, y in zip(la, lb))

    s0 = snap(state)
    state, _ = train_step(state, st, grid, batch, cfgj)   # step 0: mlp phase
    s1 = snap(state)
    assert same(s0.params["points"], s1.params["points"])
    assert same(s0.opt_state.inner_states["points"],
                s1.opt_state.inner_states["points"])
    assert not same(s0.params["mlp"], s1.params["mlp"])

    state, _ = train_step(state, st, grid, batch, cfgj)   # step 1: points
    s2 = snap(state)
    assert same(s1.params["mlp"], s2.params["mlp"])
    assert same(s1.opt_state.inner_states["mlp"],
                s2.opt_state.inner_states["mlp"])
    assert not same(s1.params["points"], s2.params["points"])
