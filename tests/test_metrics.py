"""Metric-protocol tests: SSIM/PSNR oracles vs skimage (when present) and the
perceptual-distance proxy's required properties (determinism, identity,
monotonicity in degradation strength)."""
import numpy as np
import pytest

from pointnerf_tpu.utils.metrics import (lpips_fn, lpips_proxy, psnr,
                                         report_metrics, rmse, ssim)


def _img(seed=0, hw=48):
    rng = np.random.RandomState(seed)
    # smooth-ish image: random low-freq + edges
    base = rng.rand(hw // 8, hw // 8, 3)
    img = np.kron(base, np.ones((8, 8, 1)))
    img[hw // 2:, :] *= 0.3
    return np.clip(img.astype(np.float32), 0, 1)


def test_ssim_matches_skimage():
    sk = pytest.importorskip("skimage.metrics")
    a, b = _img(0), np.clip(_img(0) + np.random.RandomState(1)
                            .normal(0, 0.05, _img(0).shape), 0, 1).astype(np.float32)
    ours = ssim(a, b)
    ref = sk.structural_similarity(a, b, win_size=11, channel_axis=-1,
                                   data_range=1.0)
    assert abs(ours - ref) < 5e-3


def test_lpips_proxy_identity_and_determinism():
    a = _img(0)
    assert lpips_proxy(a, a) == 0.0
    b = np.clip(a + 0.1 * np.random.RandomState(2).rand(*a.shape), 0, 1)
    d1 = lpips_proxy(a, b.astype(np.float32))
    d2 = lpips_proxy(a, b.astype(np.float32))
    assert d1 == d2 > 0


def test_lpips_proxy_monotone_in_noise():
    a = _img(0)
    rng = np.random.RandomState(3)
    noise = rng.normal(0, 1, a.shape).astype(np.float32)
    ds = [lpips_proxy(a, np.clip(a + s * noise, 0, 1)) for s in
          (0.02, 0.08, 0.25, 0.6)]
    assert all(x < y for x, y in zip(ds, ds[1:])), ds


def test_lpips_proxy_penalizes_structure_loss_more_than_shift():
    """A constant brightness shift (structure preserved) must score closer
    than shuffling the image content at the same RMSE."""
    a = _img(0)
    shift = np.clip(a + 0.15, 0, 1)
    rng = np.random.RandomState(4)
    perm = a.reshape(-1, 3)[rng.permutation(a.shape[0] * a.shape[1])]
    shuffled = perm.reshape(a.shape)
    assert lpips_proxy(a, shift) < lpips_proxy(a, shuffled)


def test_report_metrics_includes_proxy_and_gates_lpips():
    a, b = _img(0), _img(1)
    out = report_metrics([a], [b])
    assert out["psnr"] > 0 and 0 <= out["ssim"] <= 1
    assert out["lpips_proxy"] is not None and out["lpips_proxy"] > 0
    if lpips_fn("alex") is None:         # env without weights: honest None
        assert out["lpips"] is None
