"""Golden numerical parity against the PyTorch reference (BASELINE.json:5).

The reference's CPU-runnable modules are imported directly from
/root/reference and used as oracles: same weights, same inputs -> outputs
and input-gradients must agree. Covers the aggregator MLP decode
(PointAggregator.viewmlp, agg_intrp_order=2 canonical path) and the
ray-march compositor. The CUDA querier can't run here; KNN parity is
covered separately by the numpy oracles in test_ops.py.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# new scipy renamed sph_harm -> sph_harm_y; the reference's table-SH module
# imports the old name at module load (we don't exercise SH here)
import scipy.special as _ss
if not hasattr(_ss, "sph_harm"):
    _ss.sph_harm = getattr(_ss, "sph_harm_y", None)
    _ss.lpmn = getattr(_ss, "lpmn", None) or getattr(_ss, "assoc_legendre_p_all", None)

import jax
import jax.numpy as jnp

from pointnerf_tpu.config import AggregatorConfig
from pointnerf_tpu.models.aggregator import aggregate, init_aggregator_params
from pointnerf_tpu.models.points import SampledPoints


def _ref_modules():
    from models.rendering import diff_ray_marching as drm
    from models.rendering import diff_render_func as drf
    from models.aggregators import point_aggregators as pa
    return drm, drf, pa


def test_ray_march_matches_reference():
    drm, drf, _ = _ref_modules()
    rng = np.random.RandomState(0)
    B, R, SR, C = 1, 5, 9, 3
    dist = rng.rand(B, R, SR).astype(np.float32) * 0.1
    valid = rng.rand(B, R, SR) > 0.3
    feats = rng.rand(B, R, SR, 1 + C).astype(np.float32)
    bg = np.array([1.0, 1.0, 1.0], np.float32)

    t = lambda x: torch.from_numpy(np.asarray(x))
    # the fork's ray_march hard-codes 128 bg channels (diff_ray_marching.py
    # :545, SURVEY.md §2.4) — composite the background manually like the
    # canonical 3-channel upstream
    (ray_color, point_color, opacity, acc, bw, bg_tr, bg_bw) = drm.ray_march(
        t(dist), t(valid), t(feats), drf.radiance_render, drf.alpha_blend,
        None)
    ray_color = ray_color + t(bg).view(1, 1, 3) * bg_tr

    from pointnerf_tpu.models.ray_march import (alpha_blend, radiance_render,
                                                ray_march)
    got = ray_march(jnp.asarray(dist[0]), jnp.asarray(valid[0]),
                    jnp.asarray(feats[0]), radiance_render, alpha_blend,
                    jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(got[0]), ray_color[0].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[2]), opacity[0].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[5]), bg_tr[0].numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Aggregator parity
# ---------------------------------------------------------------------------

F_DIM = 16
HID = 32


def _cfg():
    return AggregatorConfig(
        point_features_dim=F_DIM, shading_feature_num=HID,
        shading_feature_mlp_layer1=2, shading_feature_mlp_layer2=0,
        shading_feature_mlp_layer3=2, shading_alpha_mlp_layer=1,
        shading_color_mlp_layer=4, num_feat_freqs=3, dist_xyz_freq=5,
        num_pos_freqs=10, num_viewdir_freqs=4, agg_dist_pers=20,
        agg_intrp_order=2, agg_distance_kernel="linear", act_super=1,
        act_type="LeakyReLU")


def _ref_opt(pa):
    import argparse
    parser = argparse.ArgumentParser()
    pa.PointAggregator.modify_commandline_options(parser)
    opt = parser.parse_args([])
    opt.point_features_dim = F_DIM
    opt.shading_feature_num = HID
    opt.shading_feature_mlp_layer1 = 2
    opt.shading_feature_mlp_layer2 = 0
    opt.shading_feature_mlp_layer3 = 2
    opt.shading_alpha_mlp_layer = 1
    opt.shading_color_mlp_layer = 4
    opt.num_feat_freqs = 3
    opt.dist_xyz_freq = 5
    opt.num_pos_freqs = 10
    opt.num_viewdir_freqs = 4
    opt.agg_dist_pers = 20
    opt.agg_intrp_order = 2
    opt.agg_distance_kernel = "linear"
    opt.act_type = "LeakyReLU"
    opt.act_super = 1
    opt.agg_weight_norm = 1
    opt.apply_pnt_mask = 1
    opt.point_color_mode = "1"
    opt.point_dir_mode = "1"
    opt.point_conf_mode = "1"
    opt.shading_color_channel_num = 3
    opt.sparse_loss_weight = 0
    opt.zero_one_loss_items = ["conf_coefficient"]
    opt.prob = 0
    opt.dist_xyz_deno = 0.0
    opt.agg_axis_weight = None
    opt.which_agg_model = "viewmlp"
    return opt


def _copy_weights(agg, params):
    """Copy OUR params into the reference torch module (Linear.weight is the
    transpose of our [in, out] kernels)."""
    import torch.nn as nn

    def fill(seq, layers):
        lins = [m for m in seq if isinstance(m, nn.Linear)]
        assert len(lins) == len(layers), (len(lins), len(layers))
        for lin, layer in zip(lins, layers):
            lin.weight.data = torch.from_numpy(
                np.asarray(layer["w"]).T.copy())
            lin.bias.data = torch.from_numpy(np.asarray(layer["b"]).copy())

    fill(agg.block1, params["block1"])
    fill(agg.block3, params["block3"])
    fill(agg.alpha_branch, params["alpha"])
    fill(agg.color_branch, params["color"])


def test_aggregator_matches_reference():
    _, _, pa = _ref_modules()
    import torch.nn as nn
    opt = _ref_opt(pa)
    ref = pa.PointAggregator(opt)
    # restore the upstream color head the fork removed (SURVEY.md §2.4):
    # final Linear -> 3 inside color_branch + widened sigmoid on the output
    ref.color_branch = nn.Sequential(*list(ref.color_branch.children()),
                                     nn.Linear(HID // 2, 3))

    cfg = _cfg()
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg)
    _copy_weights(ref, params)

    rng = np.random.RandomState(1)
    R, SR, K = 4, 6, 3
    mask = rng.rand(R, SR, K) > 0.35
    mask[0, 0] = False  # an all-invalid shading point
    xyz = rng.randn(R, SR, K, 3).astype(np.float32) * 0.1
    xyz_pers = rng.randn(R, SR, K, 3).astype(np.float32) * 0.1 + 1.0
    feats = rng.randn(R, SR, K, F_DIM).astype(np.float32) * 0.3
    conf = rng.rand(R, SR, K, 1).astype(np.float32)
    color = rng.rand(R, SR, K, 3).astype(np.float32)
    dirs = rng.randn(R, SR, K, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-9
    sample_loc = rng.randn(R, SR, 3).astype(np.float32) * 0.1 + 1.0
    sample_loc_w = rng.randn(R, SR, 3).astype(np.float32) * 0.1
    ray_dirs = rng.randn(R, SR, 3).astype(np.float32)
    ray_dirs /= np.linalg.norm(ray_dirs, axis=-1, keepdims=True) + 1e-9
    vsize = np.array([0.004, 0.004, 0.004], np.float32)

    # ---- reference ------------------------------------------------------
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    feats_t = t(feats)[None].requires_grad_(True)
    out_t, ray_valid_t, _w, _c = ref(
        t(color)[None], torch.eye(3), t(dirs)[None], t(conf)[None],
        feats_t, t(xyz_pers)[None], t(xyz)[None],
        torch.from_numpy(mask)[None], t(sample_loc)[None],
        t(sample_loc_w)[None], t(ray_dirs)[None], vsize, float(vsize[0] * 2))
    # apply the upstream output color activation (fork commented it out),
    # masked to valid rays like our output_placeholder semantics
    rv = ray_valid_t[0].to(torch.float32)[..., None]
    alpha_ref = out_t[0, ..., :1]
    color_ref = (torch.sigmoid(out_t[0, ..., 1:]) * (1 + 2 * 0.001) - 0.001)
    ref_out = torch.cat([alpha_ref, color_ref], -1) * rv
    ref_out.sum().backward()
    ref_grad = feats_t.grad[0].numpy()

    # ---- ours -----------------------------------------------------------
    sp = SampledPoints(
        xyz=jnp.asarray(xyz), xyz_pers=jnp.asarray(xyz_pers),
        features=jnp.asarray(feats), conf=jnp.asarray(conf),
        color=jnp.asarray(color), dirs=jnp.asarray(dirs),
        mask=jnp.asarray(mask))

    def run(f):
        out = aggregate(params, cfg, sp._replace(features=f),
                        jnp.asarray(sample_loc), jnp.asarray(sample_loc_w),
                        jnp.asarray(ray_dirs), tuple(vsize.tolist()),
                        Rw2c=jnp.eye(3))
        return out.features

    got = run(jnp.asarray(feats))
    got_grad = jax.grad(lambda f: jnp.sum(run(f)))(jnp.asarray(feats))

    ref_np = ref_out.detach().numpy()
    got_np = np.asarray(got)
    # alpha channel parity
    np.testing.assert_allclose(got_np[..., 0], ref_np[..., 0],
                               rtol=2e-4, atol=2e-5)
    # color channels (only where rays are valid; invalid are zero both sides)
    np.testing.assert_allclose(got_np[..., 1:], ref_np[..., 1:],
                               rtol=2e-4, atol=2e-5)
    # pixel-gradient parity w.r.t. point features
    np.testing.assert_allclose(np.asarray(got_grad), ref_grad,
                               rtol=3e-4, atol=3e-5)
