"""MVSNet depth estimation — TPU-native (flax, NHWC/NDHWC).

Re-architecture of the reference's official MVSNet
(models/depth_estimators/mvsnet.py:7-143, module.py:6-80):
FeatureNet 2D CNN (3->32 @ 1/4 res) -> differentiable plane-sweep homography
warp -> variance cost volume over views -> CostRegNet 3D UNet -> softmax ->
soft-argmax depth regression + 4-tap photometric confidence.

TPU choices: channels-last layouts (XLA's native conv format), batch-free
per-view tensors vmapped where batching is needed, lax.scan over views for
the cost-volume accumulation (memory: one warped volume at a time, matching
the reference's in-place accumulation trick at mvsnet.py:113-120).
Plain BatchNorm replaces InPlaceABN (SURVEY.md §2.1 N4) — XLA fuses
norm+activation into the convs anyway.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sample2d import bilinear_sample


class ConvBnReLU(nn.Module):
    """Conv2d(bias=False) + BN + ReLU (module.py:6-13). Explicit symmetric
    padding k//2 matches torch exactly — XLA "SAME" splits stride-2 padding
    asymmetrically ((1,2) for k=5 s=2 where torch pads (2,2)), which shifts
    border pixels and breaks imported-checkpoint parity."""
    out_ch: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel,) * 2,
                    strides=(self.stride,) * 2, padding=[(p, p)] * 2,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class ConvBnReLU3D(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel,) * 3,
                    strides=(self.stride,) * 3, padding=[(p, p)] * 3,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class DeconvBnReLU3D(nn.Module):
    """ConvTranspose3d(k=3, s=2, pad=1, output_pad=1, bias=False) + BN + ReLU
    (mvsnet.py:44-57). torch's transposed conv == lhs-dilated conv with the
    FLIPPED kernel and pads (k-1-pad, k-1-pad+output_pad) = (1, 2); flax
    expresses that as ConvTranspose(transpose_kernel=True, padding=((1,2),))."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.out_ch, (3, 3, 3), strides=(2, 2, 2),
                             padding=[(1, 2)] * 3, transpose_kernel=True,
                             use_bias=False, name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class FeatureNet(nn.Module):
    """3 -> 32 channels at 1/4 resolution (mvsnet.py:7-27). Submodule names
    mirror the torch attribute names so checkpoint import is 1:1
    (mvs/torch_import.py)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnReLU(8, name="conv0")(x, train)
        x = ConvBnReLU(8, name="conv1")(x, train)
        x = ConvBnReLU(16, kernel=5, stride=2, name="conv2")(x, train)
        x = ConvBnReLU(16, name="conv3")(x, train)
        x = ConvBnReLU(16, name="conv4")(x, train)
        x = ConvBnReLU(32, kernel=5, stride=2, name="conv5")(x, train)
        x = ConvBnReLU(32, name="conv6")(x, train)
        return nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, name="feature")(x)


class CostRegNet(nn.Module):
    """3D UNet cost regularization (mvsnet.py:30-71). Input [D,H,W,32] ->
    [D,H,W,1]. Names mirror the torch attributes (conv7/conv9/conv11 are the
    up blocks)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = ConvBnReLU3D(8, name="conv0")(x, train)
        c2 = ConvBnReLU3D(16, name="conv2")(
            ConvBnReLU3D(16, stride=2, name="conv1")(c0, train), train)
        c4 = ConvBnReLU3D(32, name="conv4")(
            ConvBnReLU3D(32, stride=2, name="conv3")(c2, train), train)
        x = ConvBnReLU3D(64, name="conv6")(
            ConvBnReLU3D(64, stride=2, name="conv5")(c4, train), train)
        x = c4 + DeconvBnReLU3D(32, name="conv7")(x, train)
        x = c2 + DeconvBnReLU3D(16, name="conv9")(x, train)
        x = c0 + DeconvBnReLU3D(8, name="conv11")(x, train)
        return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, name="prob")(x)


def homo_warp(src_feat: jnp.ndarray, proj: jnp.ndarray,
              depth_values: jnp.ndarray,
              align_corners: bool = True) -> jnp.ndarray:
    """Plane-sweep warp of one source feature map into the reference view.

    src_feat: [H, W, C]; proj: [4,4] src@ref^-1 combined projection;
    depth_values: [D]. Returns [D, H, W, C] (module.py homo_warping:36-73,
    channels-last).

    align_corners: the reference normalizes by (W-1)/2 (align_corners=True
    convention, module.py:61-62) but then calls grid_sample under torch
    1.8 whose DEFAULT is align_corners=False — its samples actually land at
    px*W/(W-1) - 0.5, a slight scale+shift. True (default) samples at the
    geometrically intended pixel coords; False reproduces the reference's
    as-run torch behavior bit-for-bit (required when importing torch
    MVSNet checkpoints so the features match what the weights were
    finetuned/evaluated with)."""
    H, W, C = src_feat.shape
    D = depth_values.shape[0]
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(x)
    xyz = jnp.stack([x, y, ones], axis=0).reshape(3, -1)      # [3, H*W]
    rot = proj[:3, :3]
    trans = proj[:3, 3:4]
    rot_xyz = rot @ xyz                                       # [3, H*W]
    # [3, D, H*W]
    pts = rot_xyz[:, None, :] * depth_values[None, :, None] + trans[:, :, None]
    z = pts[2]
    px = pts[0] / z
    py = pts[1] / z
    if not align_corners:
        px = px * (W / (W - 1)) - 0.5
        py = py * (H / (H - 1)) - 0.5
    sampled = bilinear_sample(src_feat, px.reshape(-1), py.reshape(-1))
    # behind-camera samples are invalid (grid_sample would place them
    # off-grid through the sign flip; mask explicitly)
    valid = (z.reshape(-1) > 1e-6)[..., None]
    return (sampled * valid).reshape(D, H, W, C)


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray
                     ) -> jnp.ndarray:
    """Soft-argmax over the depth axis (module.py:75-80).
    prob: [D, H, W]; depth_values: [D] -> [H, W]."""
    return jnp.sum(prob * depth_values[:, None, None], axis=0)


class MVSNet(nn.Module):
    """Full depth network (mvsnet.py:90-141). Operates on one reference view
    with V images; no batch dim (vmap for batches).

    align_corners=False reproduces the reference's as-run grid_sample
    semantics (see homo_warp) — use it with torch-imported checkpoints."""
    align_corners: bool = True

    def setup(self):
        self.feature = FeatureNet()
        self.cost_regularization = CostRegNet()

    def extract_features(self, imgs, train: bool = False):
        """imgs: [V, H, W, 3] -> [V, H/4, W/4, 32]. Static loop over views
        (V is 3-4): jax.vmap over a bound flax method leaks BatchTracers
        through the mutable batch_stats writes."""
        return jnp.stack([self.feature(imgs[v], train)
                          for v in range(imgs.shape[0])])

    def __call__(self, imgs: jnp.ndarray, proj_mats: jnp.ndarray,
                 depth_values: jnp.ndarray, train: bool = False,
                 features: Optional[jnp.ndarray] = None):
        """imgs [V, H, W, 3]; proj_mats [V, 4, 4] (combined src@ref^-1 at
        feature resolution); depth_values [D].

        Returns (depth [h,w], photometric_confidence [h,w],
        features [V,h,w,32], prob_volume [D,h,w])."""
        H, W = imgs.shape[1:3]
        D = depth_values.shape[0]
        assert H % 32 == 0 and W % 32 == 0 and D % 8 == 0, (
            f"MVSNet needs H,W divisible by 32 and D by 8 (UNet strides); "
            f"got H={H} W={W} D={D}")
        if features is None:
            features = self.extract_features(imgs, train)
        V = features.shape[0]

        # variance cost volume, one warped view at a time (scan = O(1) mem)
        def body(carry, inp):
            s, sq = carry
            feat, proj = inp
            w = homo_warp(feat, proj, depth_values, self.align_corners)
            return (s + w, sq + w * w), None

        h, w_, C = features.shape[1:]
        init = (jnp.zeros((D, h, w_, C)), jnp.zeros((D, h, w_, C)))
        (vol_sum, vol_sq), _ = jax.lax.scan(body, init, (features, proj_mats))
        volume_variance = vol_sq / V - jnp.square(vol_sum / V)

        cost = self.cost_regularization(volume_variance, train)[..., 0]
        prob_volume = jax.nn.softmax(cost, axis=0)              # [D, h, w]
        depth = depth_regression(prob_volume, depth_values)

        # photometric confidence: prob mass over the 4 depth bins around the
        # regressed index (mvsnet.py:128-136: pad (1,2) + avg_pool 4)
        pv = jnp.pad(prob_volume, ((1, 2), (0, 0), (0, 0)))
        sum4 = pv[:-3] + pv[1:-2] + pv[2:-1] + pv[3:]          # [D, h, w]
        didx = jnp.clip(depth_regression(
            prob_volume, jnp.arange(D, dtype=jnp.float32)), 0, D - 1
        ).astype(jnp.int32)
        conf = jnp.take_along_axis(sum4, didx[None], axis=0)[0]
        conf = jax.lax.stop_gradient(conf)
        return depth, conf, features, prob_volume
