"""2D neural rendering heads (fork capability, SURVEY.md §L9).

The waymo fork decodes 128-channel feature images from the point renderer
with either a GIRAFFE-style CNN (models/neural_render/neural_renderer.py:7-105)
or a StyleGAN2 generator conditioned on per-frame style codes
(models/neural_render/stylegan2_pytorch.py:422-641). Re-implemented in flax,
channels-last; Conv2DMod's per-sample grouped convolution becomes a vmap of
a plain conv over the batch (XLA batches the grouped weights itself).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Binomial [1,2,1]² blur (neural_render/layers.py Blur), NHWC."""
    k1 = jnp.asarray([1.0, 2.0, 1.0])
    k = (k1[:, None] * k1[None, :])
    k = k / k.sum()
    C = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def upsample2x(x: jnp.ndarray, method: str = "bilinear",
               blur: bool = True) -> jnp.ndarray:
    """2x upsample; bilinear+blur matches nn.Upsample+Blur."""
    B, H, W, C = x.shape
    out = jax.image.resize(x, (B, 2 * H, 2 * W, C),
                           "nearest" if method == "nn" else "bilinear")
    if method != "nn" and blur:
        out = _blur(out)
    return out


class NeuralRenderer(nn.Module):
    """GIRAFFE-style CNN decoder (neural_renderer.py:7-105, as run by the
    fork: the upsampling calls are commented out there, so blocks keep the
    input resolution; RGB skip accumulates per block; final sigmoid)."""
    n_feat: int = 128
    input_dim: int = 131
    out_dim: int = 3
    final_actvn: bool = True
    min_feat: int = 32
    img_size: int = 64
    use_rgb_skip: bool = True
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, input_dim] feature image -> [B, H, W, out_dim]."""
        n_blocks = int(math.log2(self.img_size) - 4)
        net = (x if self.n_feat == self.input_dim
               else nn.Conv(self.n_feat, (1, 1))(x))
        widths = [self.n_feat // 2] + [
            max(self.n_feat // (2 ** (i + 2)), self.min_feat)
            for i in range(n_blocks - 1)]
        rgb = nn.Conv(self.out_dim, (3, 3), padding="SAME")(x) \
            if self.use_rgb_skip else None
        for i, w in enumerate(widths):
            hid = nn.Conv(w, (3, 3), padding="SAME")(net)
            if self.use_norm:
                hid = nn.GroupNorm(num_groups=None, group_size=1)(hid)
            net = nn.leaky_relu(hid, 0.2)
            if self.use_rgb_skip:
                rgb = rgb + nn.Conv(self.out_dim, (3, 3), padding="SAME")(net)
        if not self.use_rgb_skip:
            rgb = nn.Conv(self.out_dim, (1, 1))(net)
        return nn.sigmoid(rgb) if self.final_actvn else rgb


# ---------------------------------------------------------------------------
# StyleGAN2 (stylegan2_pytorch.py:422-641)
# ---------------------------------------------------------------------------

class EqualLinear(nn.Module):
    dim_out: int
    lr_mul: float = 0.1

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.normal(1.0),
                       (x.shape[-1], self.dim_out))
        b = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        return x @ (w * self.lr_mul) + b * self.lr_mul


class StyleVectorizer(nn.Module):
    """z -> w mapping network (:422-434)."""
    emb: int
    depth: int
    lr_mul: float = 0.1

    @nn.compact
    def __call__(self, z):
        x = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        for _ in range(self.depth):
            x = nn.leaky_relu(EqualLinear(self.emb, self.lr_mul)(x), 0.2)
        return x


class Conv2DMod(nn.Module):
    """Modulated conv (:463-499): per-sample weight = W * (style+1),
    optionally demodulated; grouped conv realized as vmap over batch."""
    out_ch: int
    kernel: int = 3
    demod: bool = True

    @nn.compact
    def __call__(self, x, style):
        """x: [B,H,W,Cin]; style: [B,Cin]."""
        Cin = x.shape[-1]
        w = self.param("weight",
                       nn.initializers.variance_scaling(2.0 / (1 + 0.2 ** 2),
                                                        "fan_in",
                                                        "truncated_normal"),
                       (self.kernel, self.kernel, Cin, self.out_ch))

        def one(xb, sb):
            wb = w * (sb + 1.0)[None, None, :, None]       # modulate
            if self.demod:
                d = jax.lax.rsqrt(
                    jnp.sum(wb * wb, axis=(0, 1, 2), keepdims=True) + 1e-8)
                wb = wb * d
            return jax.lax.conv_general_dilated(
                xb[None], wb, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        return jax.vmap(one)(x, style)


class RGBBlock(nn.Module):
    """(:436-461)."""
    latent_dim: int
    upsample: bool

    @nn.compact
    def __call__(self, x, prev_rgb, istyle):
        style = nn.Dense(x.shape[-1])(istyle)
        rgb = Conv2DMod(3, kernel=1, demod=False)(x, style)
        if prev_rgb is not None:
            rgb = rgb + prev_rgb
        if self.upsample:
            rgb = upsample2x(rgb, "bilinear")
        return rgb


class GeneratorBlock(nn.Module):
    """(:500-535; the fork's noise injection is commented out there too)."""
    latent_dim: int
    filters: int
    upsample: bool = True
    upsample_rgb: bool = True

    @nn.compact
    def __call__(self, x, prev_rgb, istyle):
        if self.upsample:
            x = upsample2x(x, "bilinear", blur=False)
        s1 = nn.Dense(x.shape[-1])(istyle)
        x = nn.leaky_relu(Conv2DMod(self.filters, 3)(x, s1), 0.2)
        s2 = nn.Dense(x.shape[-1])(istyle)
        x = nn.leaky_relu(Conv2DMod(self.filters, 3)(x, s2), 0.2)
        rgb = RGBBlock(self.latent_dim, self.upsample_rgb)(x, prev_rgb, istyle)
        return x, rgb


class Generator(nn.Module):
    """StyleGAN2 generator seeded by the point-rendered feature image
    (:562-640; `initial` replaces the learned constant — the fork feeds the
    128-channel neural-point render as the initial block)."""
    image_size: int
    latent_dim: int
    network_capacity: int = 16
    fmap_max: int = 512
    init_channels: int = 128

    @nn.compact
    def __call__(self, styles, initial):
        """styles: [B, num_layers, latent_dim]; initial: [B, h, w, 128]
        with h = image_size / 2^(num_layers-1)."""
        num_layers = int(math.log2(self.image_size) - 6)
        filters = [min(self.network_capacity * (2 ** (i + 1)), self.fmap_max)
                   for i in range(num_layers)][::-1]
        x = nn.Conv(self.init_channels, (3, 3), padding="SAME")(initial)
        rgb = None
        for ind, f in enumerate(filters):
            x, rgb = GeneratorBlock(
                self.latent_dim, f, upsample=ind != 0,
                upsample_rgb=ind != num_layers - 1)(x, rgb,
                                                    styles[:, ind])
        return rgb


class DiscriminatorBlock(nn.Module):
    """(:541-560)."""
    filters: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.filters, (1, 1),
                      strides=(2, 2) if self.downsample else (1, 1))(x)
        h = nn.leaky_relu(nn.Conv(self.filters, (3, 3), padding="SAME")(x), 0.2)
        h = nn.leaky_relu(nn.Conv(self.filters, (3, 3), padding="SAME")(h), 0.2)
        if self.downsample:
            h = nn.Conv(self.filters, (3, 3), strides=(2, 2),
                        padding="SAME")(_blur(h))
        return (h + res) * (1.0 / math.sqrt(2.0))


class Discriminator(nn.Module):
    """(:641+). Logit per image for adversarial training of the style head."""
    image_size: int
    network_capacity: int = 16
    fmap_max: int = 512

    @nn.compact
    def __call__(self, img):
        num_layers = int(math.log2(self.image_size) - 1)
        x = img
        for i in range(num_layers):
            f = min(self.network_capacity * (2 ** (i + 1)), self.fmap_max)
            x = DiscriminatorBlock(f, downsample=i != num_layers - 1)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1)(x)[:, 0]
