"""Fused Pallas KNN selection (QueryConfig.knn_select="pallas") parity
against the XLA sort selection on the prebuilt-neighbor-table path —
winner sets must be identical (ascending d2, first-occurrence tie-break,
-1/inf invalid lanes), including all-invalid centers and radius cuts.
Runs in pallas interpret mode on CPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.ops.grid import build_grid
from pointnerf_tpu.ops.query import knn_query


def _cfg(**kw):
    cfg = tiny_test_config()
    q = dataclasses.replace(cfg.query, prebuild_neighbors=True,
                            shell_layered=False, NN=2, **kw)
    return cfg.replace(query=q)


def _scene(n=512, seed=0):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(n, 3)).astype(np.float32))
    return xyz


def _centers(r, sr, seed=1):
    rng = np.random.RandomState(seed)
    loc = jnp.asarray(rng.uniform(-1.0, 1.0, size=(r, sr, 3)).astype(np.float32))
    mask = jnp.asarray(rng.rand(r, sr) > 0.2)
    return loc, mask


def _run(cfg, xyz, loc, mask):
    grid = build_grid(xyz, jnp.asarray(xyz.shape[0], jnp.int32), cfg.query)
    return knn_query(loc, mask, xyz, grid, cfg.query)


def test_pallas_matches_sort():
    xyz = _scene()
    loc, mask = _centers(13, 7)   # odd shapes force block subdivision
    cfg_s = _cfg(knn_select="sort")
    cfg_p = _cfg(knn_select="pallas")
    pid_s, d2_s = _run(cfg_s, xyz, loc, mask)
    pid_p, d2_p = _run(cfg_p, xyz, loc, mask)
    np.testing.assert_array_equal(np.asarray(pid_p), np.asarray(pid_s))
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_s),
                               rtol=1e-6, atol=1e-7)


def test_pallas_all_invalid_centers():
    xyz = _scene(64)
    loc, _ = _centers(4, 5)
    mask = jnp.zeros((4, 5), bool)
    pid_p, d2_p = _run(_cfg(knn_select="pallas"), xyz, loc, mask)
    assert np.all(np.asarray(pid_p) == -1)
    assert np.all(np.isinf(np.asarray(d2_p)))


def test_pallas_tight_radius():
    """A radius excluding most candidates still matches the sort path."""
    xyz = _scene(256, seed=3)
    loc, mask = _centers(9, 6, seed=4)
    cfg_s = _cfg(knn_select="sort", radius_limit_scale=0.5)
    cfg_p = _cfg(knn_select="pallas", radius_limit_scale=0.5)
    pid_s, d2_s = _run(cfg_s, xyz, loc, mask)
    pid_p, d2_p = _run(cfg_p, xyz, loc, mask)
    np.testing.assert_array_equal(np.asarray(pid_p), np.asarray(pid_s))


def test_pallas_falls_back_when_unsupported():
    """shell_layered=True routes to the XLA path, same results as sort."""
    xyz = _scene(128, seed=5)
    loc, mask = _centers(5, 4, seed=6)
    cfg_s = tiny_test_config()
    cfg_s = cfg_s.replace(query=dataclasses.replace(
        cfg_s.query, prebuild_neighbors=True, shell_layered=True, NN=2,
        knn_select="sort"))
    cfg_p = cfg_s.replace(query=dataclasses.replace(
        cfg_s.query, knn_select="pallas"))
    pid_s, _ = _run(cfg_s, xyz, loc, mask)
    pid_p, _ = _run(cfg_p, xyz, loc, mask)
    np.testing.assert_array_equal(np.asarray(pid_p), np.asarray(pid_s))


def test_pallas_full_render_parity():
    """End-to-end: render through both selection modes, identical colors."""
    from test_render import make_batch, setup
    from pointnerf_tpu.models.renderer import render_rays

    cfg = _cfg(knn_select="pallas")
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot, R=64)
    out_p = render_rays(params, pc, st, grid, batch, cfg)
    cfg_s = _cfg(knn_select="sort")
    out_s = render_rays(params, pc, st, grid, batch, cfg_s)
    np.testing.assert_allclose(np.asarray(out_p.coarse_raycolor),
                               np.asarray(out_s.coarse_raycolor),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(12))
def test_pallas_fuzz_many_configs(seed):
    """Randomized config sweep: K/P/kernel-size/radius/point-count/center
    shapes drawn per seed, winner sets must match the sort path exactly."""
    rng = np.random.RandomState(100 + seed)
    n = int(rng.choice([33, 128, 700, 2048]))
    K = int(rng.choice([1, 4, 8, 16]))
    P = int(rng.choice([4, 9, 16]))
    ks = int(rng.choice([1, 3, 5]))
    rscale = float(rng.choice([0.5, 2.0, 4.0, 8.0]))
    cfg = tiny_test_config()
    q = dataclasses.replace(cfg.query, prebuild_neighbors=True,
                            shell_layered=False, NN=2, K=K, P=P,
                            kernel_size=(ks, ks, ks),
                            query_size=(ks, ks, ks),
                            radius_limit_scale=rscale)
    cfg = cfg.replace(query=q)
    xyz = jnp.asarray(rng.uniform(-0.95, 0.95, size=(n, 3))
                      .astype(np.float32))
    r = int(rng.choice([1, 3, 17]))
    sr = int(rng.choice([1, 5, 11]))
    loc = jnp.asarray(rng.uniform(-1.1, 1.1, size=(r, sr, 3))
                      .astype(np.float32))
    mask = jnp.asarray(rng.rand(r, sr) > 0.3)
    cfg_s = cfg.replace(query=dataclasses.replace(q, knn_select="sort"))
    cfg_p = cfg.replace(query=dataclasses.replace(q, knn_select="pallas"))
    pid_s, d2_s = _run(cfg_s, xyz, loc, mask)
    pid_p, d2_p = _run(cfg_p, xyz, loc, mask)
    np.testing.assert_array_equal(np.asarray(pid_p), np.asarray(pid_s),
                                  err_msg=f"seed={seed} n={n} K={K} P={P} "
                                          f"ks={ks} r={rscale}")
    ok = np.isfinite(np.asarray(d2_s))
    np.testing.assert_allclose(np.asarray(d2_p)[ok], np.asarray(d2_s)[ok],
                               rtol=1e-6, atol=1e-7)
