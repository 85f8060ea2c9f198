"""Ray generators + hierarchical refinement (VERDICT r1 #6).

Golden parity (jitter=0, deterministic) against the reference's own torch
generators (models/rendering/diff_ray_marching.py), and an end-to-end test
that fine_sample_num > 0 produces a trained fine_raycolor.
"""
import dataclasses
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.renderer import render_rays
from pointnerf_tpu.ops.query import (RAY_GENERATORS, refine_ray_generation,
                                     sample_pdf)

from test_render import make_batch, setup

torch = pytest.importorskip("torch")
REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _ref():
    from models.rendering import diff_ray_marching as drm
    return drm


CASES = [
    ("near_far_linear", "near_far_linear_ray_generation", {}),
    ("near_far_disparity_linear",
     "near_far_disparity_linear_ray_generation", {}),
    ("near_middle_far", "near_middle_far_ray_generation",
     {"middle": 3.0, "middle_split": 0.6}),
    ("nerf_near_far_linear", "nerf_near_far_linear_ray_generation", {}),
    ("nerf_near_far_disparity_linear",
     "nerf_near_far_disparity_linear_ray_generation", {}),
]


@pytest.mark.parametrize("ours,theirs,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_generator_matches_reference(ours, theirs, kw):
    drm = _ref()
    rng = np.random.RandomState(0)
    R, D = 7, 24
    campos = np.array([0.1, -0.2, -3.0], np.float32)
    raydir = rng.normal(0, 1, (R, 3)).astype(np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    near, far = 2.0, 6.0

    # the reference generators need [N,1,1]-shaped near/far tensors (their
    # real call path passes tensors; python floats crash several of them)
    t_kw = {k: torch.full((1, 1, 1), v) for k, v in kw.items()
            if k == "middle"}
    t_kw.update({k: v for k, v in kw.items() if k != "middle"})
    tpos, tseg, tvalid, tts = getattr(drm, theirs)(
        torch.from_numpy(campos[None]), torch.from_numpy(raydir[None]),
        D, near=torch.full((1, 1, 1), near), far=torch.full((1, 1, 1), far),
        jitter=0.0, **t_kw)

    jpos, jseg, jts = RAY_GENERATORS[ours](
        jnp.asarray(campos), jnp.asarray(raydir), D, near, far,
        jitter=0.0, **kw)

    def bcast(t, like):
        a = t.numpy().reshape(-1, t.shape[-1])
        return np.broadcast_to(a, like.shape) if a.shape[0] == 1 else a

    jpos_np, jts_np = np.asarray(jpos), np.asarray(jts)
    tpos_np = tpos.numpy().reshape(-1, *tpos.shape[-2:])
    if tpos_np.shape[0] == 1:
        tpos_np = np.broadcast_to(tpos_np, jpos_np.shape)
    np.testing.assert_allclose(jpos_np, tpos_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jts_np, bcast(tts, jts_np),
                               rtol=1e-5, atol=1e-5)
    tseg_np = bcast(tseg, np.asarray(jseg))
    jseg_np = np.asarray(jseg)
    if ours == "near_far_disparity_linear":
        # our disparity generator scales seglen by ||raydir|| like the linear
        # one; the reference leaves it unscaled there (inconsistency in the
        # reference itself) — compare up to that factor
        jseg_np = jseg_np / np.linalg.norm(raydir, axis=-1, keepdims=True)
    if ours == "near_middle_far":
        # the reference returns the untruncated segment array ([:point_count]
        # applied only to the cumsum input) — compare the used prefix
        tseg_np = tseg_np[:, :jseg_np.shape[1]]
    np.testing.assert_allclose(jseg_np, tseg_np, rtol=1e-5, atol=1e-5)


def test_sample_pdf_matches_reference():
    drm = _ref()
    rng = np.random.RandomState(1)
    R, S, n = 5, 16, 9
    ts = np.sort(rng.rand(R, S).astype(np.float32) * 4 + 2, axis=-1)
    w = rng.rand(R, S).astype(np.float32)

    ref = drm.sample_pdf(torch.from_numpy(ts[None])[..., None],
                         torch.from_numpy(w[None])[..., None],
                         n, det=True)[0, ..., 0].numpy()
    ours = np.asarray(sample_pdf(jnp.asarray(ts), jnp.asarray(w), n,
                                 det=True))
    # f32 cumsum association differs between np and XLA; CDF inversion can
    # shift a sample by ~1e-6 within its bin
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_refine_matches_reference():
    drm = _ref()
    rng = np.random.RandomState(2)
    R, S, n = 4, 12, 6
    campos = np.zeros(3, np.float32)
    raydir = rng.normal(0, 1, (R, 3)).astype(np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    ts = np.sort(rng.rand(R, S).astype(np.float32) * 4 + 2, axis=-1)
    w = rng.rand(R, S, 1).astype(np.float32)

    tpos, tseg, _tv, tts = drm.refine_ray_generation(
        torch.from_numpy(campos[None]), torch.from_numpy(raydir[None]), n,
        torch.from_numpy(ts[None]), torch.from_numpy(w[None]), jitter=0)
    jpos, jseg, jts = refine_ray_generation(
        jnp.asarray(campos), jnp.asarray(raydir), n, jnp.asarray(ts),
        jnp.asarray(w[..., 0]), jitter=0.0)
    # same f32-cumsum CDF sensitivity as sample_pdf above
    np.testing.assert_allclose(np.asarray(jpos), tpos[0].numpy(),
                               rtol=1e-4, atol=1e-4)
    # seg = diff of adjacent sorted samples: cancellation amplifies the
    # ~1e-5 CDF noise into large RELATIVE error on near-zero segments
    np.testing.assert_allclose(np.asarray(jseg), tseg[0].numpy(),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jts), tts[0].numpy(),
                               rtol=1e-4, atol=1e-4)


def test_generators_render_finite():
    """Every registered generator drives the full render path."""
    for name in RAY_GENERATORS:
        cfg = tiny_test_config()
        cfg = cfg.replace(render=dataclasses.replace(
            cfg.render, which_ray_generation=name))
        pc, st, params, grid, campos, camrot = setup(cfg)
        out = render_rays(params, pc, st, grid, make_batch(campos, camrot),
                          cfg)
        assert np.isfinite(np.asarray(out.coarse_raycolor)).all(), name


def test_fine_pass_trains():
    """fine_sample_num > 0: fine_raycolor exists, is finite, feeds the loss,
    and backprop through the refined pass works."""
    from pointnerf_tpu.models.losses import compute_losses
    cfg = tiny_test_config()
    cfg = cfg.replace(
        render=dataclasses.replace(cfg.render, fine_sample_num=8),
        loss=dataclasses.replace(
            cfg.loss,
            color_loss_items=cfg.loss.color_loss_items + ("fine_raycolor",),
            color_loss_weights=cfg.loss.color_loss_weights + (1.0,)))
    pc, st, params, grid, campos, camrot = setup(cfg)
    batch = make_batch(campos, camrot)
    out = render_rays(params, pc, st, grid, batch, cfg,
                      key=jax.random.PRNGKey(0), train=True)
    assert out.fine_raycolor is not None
    assert out.fine_raycolor.shape == out.coarse_raycolor.shape
    assert np.isfinite(np.asarray(out.fine_raycolor)).all()
    total, items = compute_losses(out, batch.gt_image, cfg.loss)
    assert "loss_fine_raycolor" in items

    def loss(params):
        o = render_rays(params, pc, st, grid, batch, cfg,
                        key=jax.random.PRNGKey(0), train=True)
        t, _ = compute_losses(o, batch.gt_image, cfg.loss)
        return t

    g = jax.grad(loss)(params)
    gl = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g)])
    assert np.isfinite(gl).all() and np.abs(gl).max() > 0
