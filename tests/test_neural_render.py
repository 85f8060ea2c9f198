"""2D neural-render heads: CNN upsampler + StyleGAN2 generator/discriminator."""
import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.models.neural_render import (Discriminator, Generator,
                                                NeuralRenderer,
                                                StyleVectorizer, upsample2x)


def test_neural_renderer_decodes_features():
    model = NeuralRenderer(n_feat=32, input_dim=16, out_dim=3, img_size=64,
                           min_feat=8)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 16, 16, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= 1).all()


def test_stylegan_generator_upsamples():
    img_size = 256
    latent = 32
    num_layers = int(np.log2(img_size) - 6)  # 2
    gen = Generator(image_size=img_size, latent_dim=latent,
                    network_capacity=4, init_channels=16)
    h = img_size // (2 ** (num_layers - 1))
    styles = jnp.asarray(np.random.RandomState(0).rand(1, num_layers, latent),
                         jnp.float32)
    initial = jnp.asarray(np.random.RandomState(1).rand(1, h, h, 16),
                          jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), styles, initial)
    rgb = gen.apply(params, styles, initial)
    assert rgb.shape == (1, img_size, img_size, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_style_vectorizer_and_discriminator():
    sv = StyleVectorizer(emb=32, depth=3)
    z = jnp.asarray(np.random.RandomState(0).randn(4, 32), jnp.float32)
    p = sv.init(jax.random.PRNGKey(0), z)
    w = sv.apply(p, z)
    assert w.shape == (4, 32)

    disc = Discriminator(image_size=32, network_capacity=4)
    img = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    dp = disc.init(jax.random.PRNGKey(1), img)
    logits = disc.apply(dp, img)
    assert logits.shape == (2,)
    assert np.isfinite(np.asarray(logits)).all()


def test_upsample2x():
    x = jnp.ones((1, 4, 4, 2))
    assert upsample2x(x, "nn").shape == (1, 8, 8, 2)
    y = upsample2x(x, "bilinear")
    assert y.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(y)[0, 2:6, 2:6], 1.0, atol=1e-5)
