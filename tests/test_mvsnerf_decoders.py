"""Golden parity of the MVSNeRF decoder variants against the reference's own
torch modules (models/mvs/models.py Renderer_ours/linear/attention/
color_fusion + MultiHeadAttention), with identical weights copied across.

The reference module imports inplace_abn / torch_scatter (CUDA extensions
absent here) at module scope; they are stubbed before import — the Renderer
classes never touch them.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# stub the CUDA-extension imports used elsewhere in the reference module
sys.modules.setdefault("inplace_abn", types.SimpleNamespace(
    InPlaceABN=torch.nn.BatchNorm2d))
sys.modules.setdefault("torch_scatter", types.SimpleNamespace(
    scatter_mean=None, scatter_min=None, scatter_max=None,
    segment_coo=None, scatter=None))
_tv = types.ModuleType("torchvision")
_tv.transforms = types.ModuleType("torchvision.transforms")
_tv.transforms.Compose = lambda *a, **k: None
_tv.transforms.ToTensor = lambda *a, **k: None
_tv.transforms.Normalize = lambda *a, **k: None
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tv.transforms)


def _create_meshgrid(height, width, normalized_coordinates=True,
                     device=None, dtype=None):
    xs = torch.linspace(0, width - 1, width, device=device, dtype=dtype)
    ys = torch.linspace(0, height - 1, height, device=device, dtype=dtype)
    if normalized_coordinates:
        xs = xs / (width - 1) * 2 - 1
        ys = ys / (height - 1) * 2 - 1
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], dim=-1)[None]


_kornia = types.ModuleType("kornia")
_kornia.utils = types.ModuleType("kornia.utils")
_kornia.utils.create_meshgrid = _create_meshgrid
_kornia.create_meshgrid = _create_meshgrid
sys.modules.setdefault("kornia", _kornia)
sys.modules.setdefault("kornia.utils", _kornia.utils)
sys.modules.setdefault("warmup_scheduler", types.SimpleNamespace(
    GradualWarmupScheduler=None))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointnerf_tpu.mvs.mvsnerf import (MVSNERF_DECODERS,  # noqa: E402
                                       MultiHeadAttention, RendererAttention,
                                       RendererColorFusion, RendererLinear,
                                       RendererOurs)

ref_models = pytest.importorskip("models.mvs.models")

IN_PTS, IN_VIEWS = 63, 27


def t2n(t):
    return t.detach().cpu().numpy()


def copy_linear(flax_params, name, torch_lin):
    flax_params[name] = {"kernel": jnp.asarray(t2n(torch_lin.weight).T),
                         "bias": jnp.asarray(t2n(torch_lin.bias))}


def copy_linear_nobias(flax_params, name, torch_lin):
    flax_params[name] = {"kernel": jnp.asarray(t2n(torch_lin.weight).T)}


def copy_mlp_common(p, tm, D):
    for i in range(D):
        copy_linear(p, f"pts_linears_{i}", tm.pts_linears[i])
    copy_linear(p, "pts_bias", tm.pts_bias)


def copy_heads(p, tm):
    copy_linear(p, "alpha_linear", tm.alpha_linear)
    copy_linear(p, "feature_linear", tm.feature_linear)
    copy_linear(p, "views_linears_0", tm.views_linears[0])
    copy_linear(p, "rgb_linear", tm.rgb_linear)


def copy_attention(p, tm):
    a = {}
    copy_linear_nobias(a, "w_qs", tm.w_qs)
    copy_linear_nobias(a, "w_ks", tm.w_ks)
    copy_linear_nobias(a, "w_vs", tm.w_vs)
    copy_linear_nobias(a, "fc", tm.fc)
    a["LayerNorm_0"] = {"scale": jnp.asarray(t2n(tm.layer_norm.weight)),
                        "bias": jnp.asarray(t2n(tm.layer_norm.bias))}
    return a


def rand_x(rng, NR, NS, feat_ch):
    return rng.rand(NR, NS, IN_PTS + feat_ch + IN_VIEWS).astype(np.float32)


def test_multihead_attention_parity():
    torch.manual_seed(0)
    tm = ref_models.MultiHeadAttention(4, 12, 4, 4)
    tm.eval()
    fm = MultiHeadAttention(4, 12, 4, 4)
    x = np.random.RandomState(0).rand(5, 3, 12).astype(np.float32)
    mask = (np.random.RandomState(1).rand(5, 3, 1) > 0.3).astype(np.float32)
    with torch.no_grad():
        ref, _ = tm(torch.from_numpy(x), torch.from_numpy(x),
                    torch.from_numpy(x), mask=torch.from_numpy(mask))
    params = copy_attention({}, tm)
    out, _ = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(x), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=2e-5)


@pytest.mark.parametrize("net_type,feat_ch", [("v0", 8), ("v2", 8)])
def test_bias_mlp_variants_parity(net_type, feat_ch):
    torch.manual_seed(1)
    cls = {"v0": ref_models.Renderer_ours, "v2": ref_models.Renderer_linear}
    tm = cls[net_type](D=8, W=256, input_ch=IN_PTS, input_ch_views=IN_VIEWS,
                       input_ch_feat=feat_ch, skips=[4], use_viewdirs=True)
    tm.eval()
    x = rand_x(np.random.RandomState(2), 4, 6, feat_ch)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    p = {}
    copy_mlp_common(p, tm, 8)
    copy_heads(p, tm)
    fm = MVSNERF_DECODERS[net_type](D=8, W=256, in_ch_pts=IN_PTS,
                                    in_ch_views=IN_VIEWS)
    out = fm.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=3e-5)


def test_renderer_attention_parity():
    torch.manual_seed(2)
    feat_ch = 8 + 12          # vol8 + 3 views x (rgb+mask)
    tm = ref_models.Renderer_attention(
        D=8, W=256, input_ch=IN_PTS, input_ch_views=IN_VIEWS,
        input_ch_feat=feat_ch, skips=[4], use_viewdirs=True)
    tm.eval()
    x = rand_x(np.random.RandomState(3), 3, 5, feat_ch)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    p = {}
    copy_mlp_common(p, tm, 8)
    copy_heads(p, tm)
    p["color_attention"] = copy_attention({}, tm.color_attention)
    copy_linear(p, "weight_out", tm.weight_out)
    fm = RendererAttention(D=8, W=256, in_ch_pts=IN_PTS,
                           in_ch_views=IN_VIEWS)
    out = fm.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=3e-5)


def test_renderer_color_fusion_parity():
    torch.manual_seed(3)
    feat_ch = 8 + 12
    tm = ref_models.Renderer_color_fusion(
        D=8, W=128, input_ch=IN_PTS, input_ch_views=IN_VIEWS,
        input_ch_feat=feat_ch, skips=[4], use_viewdirs=True)
    tm.eval()
    x = rand_x(np.random.RandomState(4), 3, 5, feat_ch)
    # make the per-view mask binary like a real validity channel
    xr = x.reshape(-1, x.shape[-1])
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    p = {}
    copy_mlp_common(p, tm, 8)
    copy_linear(p, "alpha_linear", tm.alpha_linear[0])
    copy_linear(p, "feature_linear", tm.feature_linear[0])
    copy_linear(p, "rgb_out", tm.rgb_out[0])
    p["ray_attention"] = copy_attention({}, tm.ray_attention)
    fm = RendererColorFusion(D=8, W=128, in_ch_pts=IN_PTS,
                             in_ch_views=IN_VIEWS)
    out = fm.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=3e-5)


def test_reference_wrapper_renders():
    """ReferenceMVSNeRF end-to-end through render_mvsnerf for every
    net_type (per_view_rgba for the attention variants)."""
    from pointnerf_tpu.mvs.mvsnerf import ReferenceMVSNeRF, render_mvsnerf
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(8, 16, 16, 8), jnp.float32)
    imgs = jnp.asarray(rng.rand(3, 32, 32, 3), jnp.float32)
    Ks = jnp.asarray(np.tile(np.array(
        [[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32), (3, 1, 1)))
    w2cs = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)))
    campos = jnp.zeros(3)
    raydir = jnp.asarray(
        np.stack([rng.rand(10) - 0.5, rng.rand(10) - 0.5, np.ones(10)],
                 -1).astype(np.float32))
    for nt in ("v0", "v1", "v2", "color_fusion"):
        dec = ReferenceMVSNeRF(net_type=nt, D=2, W=32)
        rgba = nt in ("v1", "color_fusion")
        feat_ch = 8 + (12 if rgba else 9)
        params = dec.init(jax.random.PRNGKey(0), jnp.zeros((4, 6, 3)),
                          jnp.zeros((4, 6, 3)),
                          jnp.zeros((4, 6, feat_ch)))["params"]
        rgb, depth, w = render_mvsnerf(
            params, dec, vol, imgs, Ks, w2cs, campos, raydir,
            near=0.5, far=3.0, n_samples=12, per_view_rgba=rgba)
        assert rgb.shape == (10, 3) and np.isfinite(np.asarray(rgb)).all()
