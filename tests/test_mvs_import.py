"""Forward parity of the torch-MVSNet checkpoint import (VERDICT r1 #5).

The pretrained .ckpt isn't in this environment, but torch is: we build the
reference's own MVSNet (models/depth_estimators/mvsnet.py), randomize every
weight/BN statistic, convert the state_dict with
pointnerf_tpu.mvs.torch_import, and require depth / photometric-confidence /
prob-volume parity through the full pipeline (FeatureNet -> grid_sample
plane sweep -> variance volume -> CostRegNet UNet with transposed convs ->
softmax regression). A real checkpoint takes the identical path.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointnerf_tpu.mvs.mvsnet import MVSNet  # noqa: E402
from pointnerf_tpu.mvs.torch_import import convert_mvsnet_state_dict  # noqa: E402


def _ref_mvsnet():
    from models.depth_estimators.mvsnet import MVSNet as TorchMVSNet
    return TorchMVSNet(refine=False)


def _randomize(sd, seed=0):
    rng = np.random.RandomState(seed)
    out = {}
    for k, v in sd.items():
        a = rng.normal(0, 0.1, tuple(v.shape)).astype(np.float32)
        if k.endswith("running_var"):
            a = np.abs(a) + 0.5
        if k.endswith("num_batches_tracked"):
            out[k] = v
            continue
        out[k] = torch.from_numpy(a)
    return out


def _scene(seed=1, V=3, H=64, W=64, D=8):
    """Plausible multi-view geometry: cameras on a small arc looking at the
    unit box, feature-resolution (H/4) projection matrices."""
    rng = np.random.RandomState(seed)
    imgs = rng.rand(V, H, W, 3).astype(np.float32)
    h, w = H // 4, W // 4
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]],
                 np.float32)
    projs = []
    for v in range(V):
        ang = 0.08 * v
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.15 * v, 0.02 * v, 2.5], np.float32)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K @ R
        P[:3, 3] = K @ t
        projs.append(P)
    projs = np.stack(projs)
    combined = np.stack([p @ np.linalg.inv(projs[0]) for p in projs]
                        ).astype(np.float32)
    depth_values = np.linspace(2.0, 3.2, D).astype(np.float32)
    return imgs, combined, depth_values


def test_torch_checkpoint_import_forward_parity():
    tm = _ref_mvsnet()
    sd = _randomize(tm.state_dict())
    tm.load_state_dict(sd)
    tm.eval()

    imgs, projs, depth_values = _scene()
    with torch.no_grad():
        t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).unsqueeze(0)
        t_depth, t_conf, _t_feats, t_prob = tm(
            t_imgs, torch.from_numpy(projs).unsqueeze(0),
            torch.from_numpy(depth_values).unsqueeze(0))

    variables = convert_mvsnet_state_dict(sd)
    model = MVSNet(align_corners=False)
    f_depth, f_conf, _f_feats, f_prob = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(depth_values))

    td = t_depth[0].numpy()
    tc = t_conf[0].numpy()
    tp = t_prob[0].numpy()
    scale = float(np.abs(td).max())

    assert np.abs(np.asarray(f_depth) - td).max() / scale < 1e-4
    assert np.abs(np.asarray(f_conf) - tc).max() < 1e-4
    assert np.abs(np.asarray(f_prob) - tp).max() < 1e-4


def test_converted_tree_matches_flax_init():
    """The converted tree must be structurally identical to a fresh flax
    init (same keys, same shapes) — guards against silent name drift."""
    tm = _ref_mvsnet()
    variables = convert_mvsnet_state_dict(tm.state_dict())
    imgs, projs, depth_values = _scene()
    init = MVSNet().init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                         jnp.asarray(projs), jnp.asarray(depth_values))

    def paths(tree):
        return {tuple(p for p in path): leaf.shape for path, leaf
                in jax.tree_util.tree_flatten_with_path(tree)[0]}

    got = {tuple(str(k) for k in p): s
           for p, s in paths(variables["params"]).items()}
    want = {tuple(str(k) for k in p): s
            for p, s in paths(init["params"]).items()}
    assert got == want
    got_s = {tuple(str(k) for k in p): s
             for p, s in paths(variables["batch_stats"]).items()}
    want_s = {tuple(str(k) for k in p): s
              for p, s in paths(init["batch_stats"]).items()}
    assert got_s == want_s


def test_ckpt_file_roundtrip(tmp_path):
    """load_pretrained_mvsnet: torch .ckpt on disk -> merged MvsPointsInit
    variables, still runnable end-to-end."""
    from pointnerf_tpu.mvs.points_init import (MvsPointsInit,
                                               init_mvs_points,
                                               load_pretrained_mvsnet)
    tm = _ref_mvsnet()
    sd = _randomize(tm.state_dict(), seed=3)
    path = str(tmp_path / "mvsnet.ckpt")
    torch.save({"model": sd}, path)

    model = MvsPointsInit(point_features_dim=8, align_corners=False)
    variables = init_mvs_points(model, jax.random.PRNGKey(0))
    merged = load_pretrained_mvsnet(variables, path, model=model)

    # loader refuses align_corners=True models (grid_sample semantics
    # mismatch vs the torch checkpoint)
    bad = MvsPointsInit(point_features_dim=8, align_corners=True)
    with pytest.raises(ValueError, match="align_corners"):
        load_pretrained_mvsnet(variables, path, model=bad)

    # the mvsnet subtree now equals the converted checkpoint
    conv = convert_mvsnet_state_dict(sd)
    chex = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(a, b)),
        merged["params"]["mvsnet"], conv["params"]))
    assert chex
    # and the bundle still runs
    imgs, projs, depth_values = _scene(V=3, H=32, W=32, D=8)
    depth, conf, feats, _ = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        jnp.asarray(imgs), jnp.asarray(projs), jnp.asarray(depth_values),
        method=model.depth_one_view)
    assert np.isfinite(np.asarray(depth)).all()
