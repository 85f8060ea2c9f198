"""Gradient-driven point splitting (TrainConfig.split_iter,
grow.py split_high_grad): the per-point gradient-norm EMA (hits column 2)
accumulates in the train step, top scorers clone with tangential jitter
into the static-capacity pad, Adam moments and counters stay consistent,
and training continues through the grown cloud."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.models.points import make_point_cloud
from pointnerf_tpu.train.grow import split_high_grad
from pointnerf_tpu.train.step import (create_train_state, refresh_grid,
                                      train_step)

from test_render import make_batch, synthetic_scene


def _cfg(**train_kw):
    cfg = tiny_test_config()
    return cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))


def _state(cfg, seed=0):
    xyz, campos, camrot = synthetic_scene(seed)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    pc, st = make_point_cloud(xyz, k1, cfg.points, cfg.agg.point_features_dim,
                              capacity=512)
    state = create_train_state(k3, init_aggregator_params(k2, cfg.agg), pc,
                               cfg)
    grid = refresh_grid(pc, st, cfg)
    return state, st, grid, campos, camrot


def test_grad_ema_accumulates():
    cfg = _cfg(split_iter=5)  # a split consumer turns hit tracking on
    state, st, grid, campos, camrot = _state(cfg)
    assert state.hits.shape[1] == 3
    batch = make_batch(campos, camrot, R=96)
    from pointnerf_tpu.config import jit_canonical
    jcfg = jit_canonical(cfg)
    for _ in range(3):
        state, _ = train_step(state, st, grid, batch, jcfg)
    ge = np.asarray(state.hits[:, 2])
    hits = np.asarray(state.hits[:, 0])
    assert ge.max() > 0.0
    # gradient EMA only flows into hit points
    assert np.all(ge[hits == 0] == 0.0)


def test_split_clones_top_scorers():
    cfg = _cfg(split_iter=5, split_top=16)
    state, st, grid, campos, camrot = _state(cfg)
    n0 = int(st.num_active)
    # synthetic counters: points 3 and 7 scream, others quiet
    hits = np.zeros((512, 3), np.float32)
    hits[:n0, 0] = 100.0
    hits[:n0, 1] = 1.0
    hits[3, 2] = 5.0
    hits[7, 2] = 3.0
    state = state._replace(hits=jnp.asarray(hits))
    state, st, added = split_high_grad(state, st, cfg)
    assert added == 2
    assert int(st.num_active) == n0 + 2
    pc = state.params["points"]
    child = np.asarray(pc.xyz[n0:n0 + 2])
    parents = np.asarray(pc.xyz)[[3, 7]]
    d = np.linalg.norm(child[:, None] - parents[None], axis=-1).min(axis=1)
    vmax = max(cfg.query.vsize[0], cfg.query.vsize[1])
    assert np.all(d <= cfg.train.split_jitter * vmax + 1e-5)
    # offspring inherit the parent payload
    feats = np.asarray(pc.features)
    assert any(np.allclose(feats[n0], feats[p]) for p in (3, 7))
    # parents' grad EMA reset; offspring counters start at zero
    assert np.all(np.asarray(state.hits)[[3, 7], 2] == 0.0)
    assert np.all(np.asarray(state.hits)[n0:n0 + 2] == 0.0)


def test_split_noop_when_quiet():
    cfg = _cfg(split_iter=5, split_top=16)
    state, st, grid, *_ = _state(cfg)
    state, st2, added = split_high_grad(state, st, cfg)
    assert added == 0 and int(st2.num_active) == int(st.num_active)


def test_training_continues_after_split():
    cfg = _cfg(split_iter=5, split_top=8)
    state, st, grid, campos, camrot = _state(cfg)
    batch = make_batch(campos, camrot, R=96)
    from pointnerf_tpu.config import jit_canonical
    jcfg = jit_canonical(cfg)
    for _ in range(3):
        state, _ = train_step(state, st, grid, batch, jcfg)
    state, st, added = split_high_grad(state, st, cfg)
    assert added > 0
    grid = refresh_grid(state.params["points"], st, cfg)
    state, items = train_step(state, st, grid, batch, jcfg)
    assert np.isfinite(float(items["loss_total"]))
