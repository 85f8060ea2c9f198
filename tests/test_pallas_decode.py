"""Fused Pallas decode (ops/pallas_decode.py) vs the XLA aggregate path.

Forward and gradient parity through the FULL aggregate() call — the fused
branch must be a drop-in replacement for the XLA decode at identical
weights/inputs (interpret mode on CPU; the same kernel compiles for TPU)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import (aggregate, fused_decode_supported,
                                             init_aggregator_params)
from pointnerf_tpu.models.points import SampledPoints


def _case(seed=0, R=6, SR=5, K=4, Fi=16):
    cfg = tiny_test_config()
    cfg = cfg.replace(agg=dataclasses.replace(
        cfg.agg, point_features_dim=Fi, shading_feature_num=64,
        fused_decode=True))
    rng = np.random.RandomState(seed)
    params = init_aggregator_params(jax.random.PRNGKey(seed), cfg.agg)
    mask = rng.rand(R, SR, K) > 0.3
    mask[:, 0] = True  # at least some fully valid slots

    def f(*shape):
        return jnp.asarray(rng.normal(0, 0.3, shape).astype(np.float32))

    sp = SampledPoints(
        xyz=f(R, SR, K, 3), xyz_pers=f(R, SR, K, 3),
        features=f(R, SR, K, Fi), conf=jnp.asarray(
            rng.rand(R, SR, K, 1).astype(np.float32)),
        color=f(R, SR, K, 3), dirs=f(R, SR, K, 3),
        mask=jnp.asarray(mask))
    sample_loc = f(R, SR, 3)
    sample_loc_w = f(R, SR, 3)
    rd = rng.normal(0, 1, (R, SR, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return cfg, params, sp, sample_loc, sample_loc_w, jnp.asarray(rd)


def _run(cfg, params, sp, sl, slw, rd, fused: bool):
    c = cfg.replace(agg=dataclasses.replace(cfg.agg, fused_decode=fused))
    return aggregate(params, c.agg, sp, sl, slw, rd, c.query.vsize,
                     Rw2c=jnp.eye(3))


def test_supported_predicate():
    cfg, *_ = _case()
    assert fused_decode_supported(cfg.agg)
    off = dataclasses.replace(cfg.agg, shading_feature_mlp_layer2=1)
    assert not fused_decode_supported(off)


def test_forward_parity():
    cfg, params, sp, sl, slw, rd = _case()
    ref = _run(cfg, params, sp, sl, slw, rd, fused=False)
    out = _run(cfg, params, sp, sl, slw, rd, fused=True)
    np.testing.assert_allclose(np.asarray(out.features),
                               np.asarray(ref.features),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.ray_valid),
                                  np.asarray(ref.ray_valid))
    np.testing.assert_allclose(np.asarray(out.weight),
                               np.asarray(ref.weight), rtol=1e-6)


def test_gradient_parity():
    cfg, params, sp, sl, slw, rd = _case(seed=3)
    payload = {"features": sp.features, "color": sp.color, "dirs": sp.dirs,
               "conf": sp.conf, "xyz": sp.xyz}

    def loss(params, payload, fused):
        sp2 = sp._replace(**payload)
        out = _run(cfg, params, sp2, sl, slw, rd, fused)
        return jnp.sum(out.features ** 2) * 0.5

    for arg in (0, 1):
        g_ref = jax.grad(loss, argnums=arg)(params, payload, False)
        g_out = jax.grad(loss, argnums=arg)(params, payload, True)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_out)[0],
                jax.tree_util.tree_flatten_with_path(g_ref)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=str(pa))


def test_no_color_dir_modes():
    """E=0 envelope: extras disabled."""
    cfg, params, sp, sl, slw, rd = _case(seed=5)
    cfg = cfg.replace(agg=dataclasses.replace(
        cfg.agg, point_color_mode=0, point_dir_mode=0))
    params = init_aggregator_params(jax.random.PRNGKey(5), cfg.agg)
    ref = _run(cfg, params, sp, sl, slw, rd, fused=False)
    out = _run(cfg, params, sp, sl, slw, rd, fused=True)
    np.testing.assert_allclose(np.asarray(out.features),
                               np.asarray(ref.features),
                               rtol=2e-5, atol=2e-5)
