"""Sharded proposal-NeRF hybrid: the field MLP is replicated and the merged
march is local to each shard's ray block, so the deterministic sharded eval
must match the single-chip hybrid render exactly; the sharded train step
must produce finite losses and nonzero field gradients."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf_tpu.models.nerf_branch import init_nerf_params
from pointnerf_tpu.parallel import (make_sharded_eval_step,
                                    make_sharded_train_step)
from pointnerf_tpu.train.step import eval_step, refresh_grid

from test_parallel import sharded_cfg  # noqa: F401
from test_render import make_batch, synthetic_scene  # noqa: F401
from test_sharded_fine import _setup  # noqa: F401

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _hybrid_cfg(compact: bool):
    cfg = sharded_cfg()
    return cfg.replace(
        render=dataclasses.replace(cfg.render, nerf_importance=6,
                                   nerf_coarse_samples=12, nerf_hidden=32,
                                   nerf_layers=2, nerf_pe_xyz=4,
                                   nerf_pe_dir=2),
        query=dataclasses.replace(cfg.query,
                                  decode_capacity=0.5 if compact else 0.0))


@pytest.mark.parametrize("compact", [True, False])
def test_sharded_hybrid_matches_single_chip(compact):
    cfg = _hybrid_cfg(compact)
    pc1, st1, params, mesh, state, scene, campos, camrot = _setup(cfg)
    nerf = init_nerf_params(jax.random.PRNGKey(5), cfg)
    params = dict(params, nerf=nerf)
    state = state._replace(params=dict(
        state.params, mlp=jax.device_put(
            params, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))))
    batch = make_batch(campos, camrot, R=64)

    ref = eval_step({"mlp": params, "points": pc1}, st1,
                    refresh_grid(pc1, st1, cfg), batch, cfg)
    assert ref.nerf_coarse_raycolor is not None

    eval_fn = make_sharded_eval_step(cfg, mesh)
    out = eval_fn(state.params, scene, batch)
    np.testing.assert_allclose(np.asarray(out.coarse_raycolor),
                               np.asarray(ref.coarse_raycolor),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.nerf_coarse_raycolor),
                               np.asarray(ref.nerf_coarse_raycolor),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.nerf_mass),
                               np.asarray(ref.nerf_mass),
                               rtol=2e-4, atol=2e-4)


def test_sharded_hybrid_train_step_runs():
    cfg = _hybrid_cfg(True)
    pc1, st1, params, mesh, state, scene, campos, camrot = _setup(cfg)
    nerf = init_nerf_params(jax.random.PRNGKey(5), cfg)
    params = dict(params, nerf=nerf)
    # rebuild the state so the optimizer tracks the field params too
    from pointnerf_tpu.parallel import create_sharded_train_state
    state, scene = create_sharded_train_state(
        jax.random.PRNGKey(9), params,
        jax.tree.map(lambda x: np.asarray(x), state.params["points"]),
        scene, cfg, mesh)
    step_fn = make_sharded_train_step(cfg, mesh)
    batch = make_batch(campos, camrot, R=64)
    p_before = jax.device_get(state.params["mlp"]["nerf"]["sigma"]["w"])
    for _ in range(2):
        state, items = step_fn(state, scene, batch)
    assert np.isfinite(float(items["loss_total"]))
    p_after = jax.device_get(state.params["mlp"]["nerf"]["sigma"]["w"])
    assert not np.allclose(p_before, p_after), "field params must update"
