"""Pallas fused ray-march kernel: parity with the XLA path (interpret mode
on CPU; the same kernel compiles for TPU via Mosaic)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.models.ray_march import (alpha_blend, radiance_render,
                                            ray_march)


def _inputs(R=64, SR=16, C=3, seed=0):
    rng = np.random.RandomState(seed)
    dist = rng.rand(R, SR).astype(np.float32) * 0.1
    valid = (rng.rand(R, SR) > 0.3).astype(np.float32)
    feats = rng.rand(R, SR, 1 + C).astype(np.float32)
    bg = np.array([1.0, 0.5, 0.25], np.float32)
    return dist, valid, feats, bg


def test_pallas_march_matches_xla(monkeypatch):
    from pointnerf_tpu.ops import pallas_march as pm
    # interpret mode: run the kernel logic on CPU
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    dist, valid, feats, bg = _inputs()
    color, opacity, bgtr = pm._pallas_march_fwd_impl(
        jnp.asarray(dist), jnp.asarray(valid), jnp.asarray(feats),
        jnp.asarray(bg))
    ray_color, _pc, op_ref, _acc, _bw, bgtr_ref, _ = ray_march(
        jnp.asarray(dist), jnp.asarray(valid.astype(bool)),
        jnp.asarray(feats), radiance_render, alpha_blend, jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(color), np.asarray(ray_color),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(opacity), np.asarray(op_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bgtr), np.asarray(bgtr_ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_march_grad_matches_xla(monkeypatch):
    from pointnerf_tpu.ops import pallas_march as pm
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    dist, valid, feats, bg = _inputs(R=16, SR=8)

    def loss_pallas(f):
        c, _o, _b = pm.pallas_ray_march(jnp.asarray(dist), jnp.asarray(valid),
                                        f, jnp.asarray(bg))
        return jnp.sum(c ** 2)

    def loss_xla(f):
        c, _o, _b = pm._xla_march(jnp.asarray(dist),
                                  jnp.asarray(valid), f, jnp.asarray(bg))
        return jnp.sum(c ** 2)

    g1 = jax.grad(loss_pallas)(jnp.asarray(feats))
    g2 = jax.grad(loss_xla)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_fused_march_renderer_parity(monkeypatch):
    """render.fused_march=True routes _finalize through the Pallas
    compositor; full renderer outputs must match the XLA path (interpret
    mode on CPU)."""
    import dataclasses
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    from pointnerf_tpu.models.renderer import render_rays
    from test_render import make_batch, setup
    from pointnerf_tpu.config import tiny_test_config

    cfg = tiny_test_config()
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot)
    out_ref = render_rays(params, pc, st, grid, batch, cfg)
    cfg_f = cfg.replace(render=dataclasses.replace(cfg.render,
                                                   fused_march=True))
    out_fused = render_rays(params, pc, st, grid, batch, cfg_f)
    np.testing.assert_allclose(np.asarray(out_fused.coarse_raycolor),
                               np.asarray(out_ref.coarse_raycolor),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_fused.coarse_depth),
                               np.asarray(out_ref.coarse_depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_fused.coarse_is_background),
                               np.asarray(out_ref.coarse_is_background),
                               rtol=1e-5, atol=1e-6)
