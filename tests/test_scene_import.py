"""Reference per-scene checkpoint importer (`{iter}_net_ray_marching.pth`).

Generates a checkpoint FROM the reference's own importable torch modules
(PointAggregator + the registered neural-point parameter names,
models/base_model.py:99-117 / neural_points.py:243-290), converts it, and
asserts the import is exact. Render parity for identical weights is pinned
separately by test_golden_torch.py; here we prove the FORMAT mapping
(Sequential indices, transposes, [1, N, *] squeezes, module. prefixes)
inverts the reference layout.

VERDICT r2 next #4.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnerf_tpu.config import tiny_test_config
from pointnerf_tpu.models.aggregator import init_aggregator_params
from pointnerf_tpu.train.torch_import import (export_reference_scene,
                                              import_reference_scene,
                                              load_npz_checkpoint,
                                              torch_dict_to_npz)

torch = pytest.importorskip("torch")


def _scene(cfg, n=64, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(n, 3).astype(np.float32) * 0.3
    sd = {
        "neural_points.xyz": torch.from_numpy(xyz),
        "neural_points.points_embeding": torch.from_numpy(
            rng.randn(1, n, cfg.agg.point_features_dim).astype(np.float32)),
        "neural_points.points_conf": torch.from_numpy(
            rng.rand(1, n, 1).astype(np.float32)),
        "neural_points.points_dir": torch.from_numpy(
            rng.randn(1, n, 3).astype(np.float32)),
        "neural_points.points_color": torch.from_numpy(
            rng.rand(1, n, 3).astype(np.float32)),
        "neural_points.Rw2c": torch.eye(3),
    }
    return xyz, sd


def _ref_aggregator_state(params):
    """Build the REAL reference PointAggregator (canonical lego-style arch
    mirroring tiny_test_config's agg), load our params into it via the
    golden-test helper, and return its state_dict under the saved
    'aggregator.' prefix."""
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import scipy.special as _ss
    if not hasattr(_ss, "sph_harm"):
        _ss.sph_harm = getattr(_ss, "sph_harm_y", None)
    from test_golden_torch import _copy_weights, _ref_opt
    from models.aggregators import point_aggregators as pa
    import torch.nn as nn

    cfg = _tiny_golden_cfg()
    opt = _ref_opt(pa)
    ref = pa.PointAggregator(opt)
    ref.color_branch = nn.Sequential(*list(ref.color_branch.children()),
                                     nn.Linear(cfg.agg.shading_feature_num
                                               // 2, 3))
    _copy_weights(ref, params)
    return {f"aggregator.{k}": v for k, v in ref.state_dict().items()}


def _tiny_golden_cfg():
    """tiny config whose agg matches test_golden_torch's reference arch."""
    from test_golden_torch import _cfg
    cfg = tiny_test_config()
    return cfg.replace(agg=_cfg())


def test_import_inverts_reference_format(tmp_path):
    cfg = _tiny_golden_cfg()
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
    xyz, sd = _scene(cfg)
    sd.update(_ref_aggregator_state(params))
    path = str(tmp_path / "30000_net_ray_marching.pth")
    torch.save(sd, path)

    pc, st, got = import_reference_scene(path, cfg)

    # point tensors land exactly, padded to the capacity bucket
    n = xyz.shape[0]
    assert int(st.num_active) == n
    np.testing.assert_array_equal(np.asarray(pc.xyz)[:n], xyz)
    np.testing.assert_array_equal(
        np.asarray(pc.features)[:n],
        sd["neural_points.points_embeding"][0].numpy())
    np.testing.assert_array_equal(
        np.asarray(pc.conf)[:n], sd["neural_points.points_conf"][0].numpy())
    np.testing.assert_array_equal(
        np.asarray(pc.color)[:n],
        sd["neural_points.points_color"][0].numpy())
    np.testing.assert_array_equal(
        np.asarray(pc.dirs)[:n], sd["neural_points.points_dir"][0].numpy())
    np.testing.assert_array_equal(np.asarray(st.Rw2c), np.eye(3))

    # aggregator weights: exact round-trip of every layer
    for k in ("block1", "block3", "alpha", "color"):
        assert len(got[k]) == len(params[k]), k
        for a, b in zip(got[k], params[k]):
            np.testing.assert_array_equal(np.asarray(a["w"]),
                                          np.asarray(b["w"]))
            np.testing.assert_array_equal(np.asarray(a["b"]),
                                          np.asarray(b["b"]))

    # the imported cloud renders through the standard path
    from test_render import make_batch
    from pointnerf_tpu.train.step import refresh_grid
    from pointnerf_tpu.models.renderer import render_rays
    grid = refresh_grid(pc, st, cfg)
    batch = make_batch(np.array([0.0, 0.0, -3.0], np.float32),
                       np.eye(3, dtype=np.float32), R=32)
    out = render_rays(got, pc, st, grid, batch, cfg)
    assert np.all(np.isfinite(np.asarray(out.coarse_raycolor)))


def test_import_handles_dataparallel_prefix_and_npz(tmp_path):
    cfg = _tiny_golden_cfg()
    params = init_aggregator_params(jax.random.PRNGKey(1), cfg.agg)
    _, sd = _scene(cfg, seed=2)
    sd.update(_ref_aggregator_state(params))
    sd = {f"module.{k}": v for k, v in sd.items()}  # DataParallel save
    path = str(tmp_path / "20000_net_ray_marching.pth")
    torch.save(sd, path)

    pc, st, got = import_reference_scene(path, cfg)
    np.testing.assert_array_equal(np.asarray(got["block1"][0]["w"]),
                                  np.asarray(params["block1"][0]["w"]))

    # torch-free ingestion path: pth -> npz -> import
    npz = str(tmp_path / "ckpt.npz")
    torch_dict_to_npz(path, npz)
    pc2, st2, got2 = import_reference_scene(load_npz_checkpoint(npz), cfg)
    np.testing.assert_array_equal(np.asarray(pc2.xyz), np.asarray(pc.xyz))
    np.testing.assert_array_equal(np.asarray(got2["color"][-1]["b"]),
                                  np.asarray(got["color"][-1]["b"]))


def test_export_round_trips_through_import():
    cfg = _tiny_golden_cfg()
    from pointnerf_tpu.models.points import make_point_cloud
    rng = np.random.RandomState(3)
    xyz = rng.randn(40, 3).astype(np.float32) * 0.2
    pc, st = make_point_cloud(xyz, jax.random.PRNGKey(2), cfg.points,
                              cfg.agg.point_features_dim)
    params = init_aggregator_params(jax.random.PRNGKey(3), cfg.agg)

    sd = export_reference_scene(pc, st, params)
    pc2, st2, params2 = import_reference_scene(sd, cfg)
    np.testing.assert_array_equal(np.asarray(pc2.xyz)[:40],
                                  np.asarray(pc.xyz)[:40])
    np.testing.assert_array_equal(np.asarray(pc2.features)[:40],
                                  np.asarray(pc.features)[:40])
    for k in params:
        for a, b in zip(params2[k], params[k]):
            np.testing.assert_array_equal(np.asarray(a["w"]),
                                          np.asarray(b["w"]))


def test_import_rejects_arch_mismatch():
    cfg = _tiny_golden_cfg()
    params = init_aggregator_params(jax.random.PRNGKey(0), cfg.agg)
    _, sd = _scene(cfg)
    sd.update(_ref_aggregator_state(params))
    import dataclasses
    bad = cfg.replace(agg=dataclasses.replace(cfg.agg,
                                              shading_feature_num=64))
    with pytest.raises(ValueError, match="architecture mismatch"):
        import_reference_scene({k: v for k, v in sd.items()}, bad)

    with pytest.raises(KeyError, match="missing"):
        import_reference_scene({"foo": np.zeros(3)}, cfg)
