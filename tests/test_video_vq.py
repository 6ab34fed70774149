"""VideoGPT-style 3D VQ-VAE + EMA codebook + 3D VAE-GAN losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.tokenizers import video_vq as vvq
from video_llamagen_tpu.tokenizers.causal_vae import losses as cvl


@pytest.fixture(scope="module")
def params():
    return vvq.init_video_vq_params(jax.random.key(0), n_codes=32,
                                    embedding_dim=8, n_hiddens=16,
                                    n_res_layers=1, downsample=(2, 2, 2))


def test_encode_decode_shapes(params):
    x = jax.random.normal(jax.random.key(1), (1, 4, 8, 8, 3))
    z = vvq.encode(params, x)
    assert z.shape == (1, 2, 4, 4, 8)
    recon, new_cb, idx, commit = vvq.forward(params, x)
    assert recon.shape == x.shape
    assert idx.shape == (1, 2, 4, 4)
    assert np.isfinite(float(commit))


def test_codebook_ema_update_moves_embeddings(params):
    cb = params["codebook"]
    z = jax.random.normal(jax.random.key(2), (64, 8)) * 3
    z_q, new_cb, idx, commit = vvq.codebook_quantize(cb, z, train=True,
                                                     rng=jax.random.key(3))
    assert not np.allclose(np.asarray(new_cb.embeddings),
                           np.asarray(cb.embeddings))
    assert bool(new_cb.initialized)


def test_codebook_dead_code_restart():
    cb = vvq.init_codebook(jax.random.key(0), 16, 4)
    # drive usage of only code regions near one cluster
    z = jnp.ones((32, 4)) * 5.0
    _, cb2, idx, _ = vvq.codebook_quantize(cb, z, train=True,
                                           rng=jax.random.key(1))
    # dead codes (not chosen) were restarted with batch vectors == 5.0
    chosen = set(np.asarray(idx).tolist())
    dead = [i for i in range(16) if i not in chosen]
    assert dead
    np.testing.assert_allclose(np.asarray(cb2.embeddings)[dead], 5.0, atol=1e-5)


def test_codebook_ste_grads(params):
    def loss_fn(z):
        z_q, _, _, _ = vvq.codebook_quantize(params["codebook"], z)
        return jnp.sum(z_q ** 2)

    z = jax.random.normal(jax.random.key(4), (8, 8))
    g = jax.grad(loss_fn)(z)
    assert not np.allclose(np.asarray(g), 0)


def test_perplexity_uniform():
    idx = jnp.arange(16) % 16
    p = vvq.perplexity(idx, 16)
    np.testing.assert_allclose(float(p), 16.0, rtol=1e-4)


def test_disc3d_and_vae_losses():
    rng = jax.random.key(0)
    disc = cvl.init_disc3d_params(rng, ndf=8, n_layers=2)
    x = jax.random.normal(jax.random.key(1), (1, 3, 32, 32, 3))
    rec = jax.random.normal(jax.random.key(2), (1, 3, 32, 32, 3))
    logits = cvl.disc3d_forward(disc, x)
    assert np.isfinite(np.asarray(logits)).all()

    kl = jnp.asarray([1.5])
    total, parts = cvl.vae_generator_loss(disc, None, x, rec, kl,
                                          jnp.asarray(100000), disc_start=10)
    assert np.isfinite(float(total))
    assert float(parts["d_weight"]) == 0.5

    d_loss, d_parts = cvl.vae_discriminator_loss(disc, x, rec,
                                                 jnp.asarray(100000),
                                                 disc_start=10)
    assert np.isfinite(float(d_loss))
