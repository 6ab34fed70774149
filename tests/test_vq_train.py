"""VQ-GAN losses + dual-optimizer trainer on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import MeshConfig, TrainConfig, VQConfig
from video_llamagen_tpu.parallel import mesh as pmesh
from video_llamagen_tpu.tokenizers.vq import losses as vql
from video_llamagen_tpu.train import train_vq


TINY = VQConfig(ch=8, z_channels=8, codebook_size=32, codebook_embed_dim=4,
                encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2),
                num_res_blocks=1, dtype="float32")


def test_hinge_d_loss_values():
    real = jnp.asarray([2.0, 0.5])
    fake = jnp.asarray([-2.0, -0.5])
    # relu(1-2)=0, relu(1-0.5)=0.5; relu(1-2)=0, relu(1+(-0.5))=0.5
    loss = vql.hinge_d_loss(real, fake)
    np.testing.assert_allclose(float(loss), 0.5 * (0.25 + 0.25), atol=1e-6)


def test_adopt_weight_warmup():
    assert float(vql.adopt_weight(0.5, jnp.asarray(10), threshold=100)) == 0.0
    assert float(vql.adopt_weight(0.5, jnp.asarray(200), threshold=100)) == 0.5


def test_patchgan_shapes():
    p = vql.init_patchgan_params(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    out = vql.patchgan_forward(p, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert np.isfinite(np.asarray(out)).all()


def test_lpips_zero_for_identical():
    p = vql.init_lpips_params(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    d = vql.lpips(p, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    assert float(vql.lpips(p, x, y)[0]) > 0


def test_vq_gan_iteration_runs():
    mesh = pmesh.make_mesh(MeshConfig(data=8))
    tcfg = TrainConfig(lr=1e-4)
    state = train_vq.create_vq_train_state(jax.random.key(0), TINY, tcfg)
    gen_jit, disc_jit = train_vq.make_vq_train_steps(
        TINY, tcfg, mesh, disc_start=1)
    # PatchGAN needs >=32px input (4 stride-2 stages); reference trains at 256
    images = jax.device_put(
        jax.random.normal(jax.random.key(1), (8, 32, 32, 3)),
        pmesh.data_sharding(mesh, 4))
    state, metrics = train_vq.train_iteration(state, images, gen_jit, disc_jit)
    assert int(state.step) == 1
    for k in ("gen_total", "rec", "vq", "commit", "disc"):
        assert np.isfinite(float(metrics[k])), k
    # second iteration (past disc_start) trains the disc too
    state, metrics = train_vq.train_iteration(state, images, gen_jit, disc_jit)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["disc"]))


def test_stylegan_disc_shapes():
    p = vql.init_stylegan_disc_params(jax.random.key(0), image_size=64)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    out = vql.stylegan_disc_forward(p, x)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_adaptive_weight_matches_manual_grad_ratio():
    """calculate_adaptive_weight == ||dnll/dw|| / (||dg/dw|| + 1e-4) with
    stop_gradient semantics (ref vq_loss.py:109-115)."""
    w = {"kernel": jax.random.normal(jax.random.key(0), (3, 3, 4, 3)) * 0.1,
         "bias": jnp.zeros((3,))}
    a = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    tgt = jax.random.normal(jax.random.key(2), (2, 8, 8, 3))
    from video_llamagen_tpu.tokenizers.vq.model import decoder_head

    nll_fn = lambda w: jnp.mean((decoder_head(w, a) - tgt) ** 2)
    g_fn = lambda w: -jnp.mean(decoder_head(w, a))
    got = vql.calculate_adaptive_weight(nll_fn, g_fn, w)

    norm = lambda t: np.sqrt(sum(float(np.sum(np.square(np.asarray(x))))
                                 for x in jax.tree_util.tree_leaves(t)))
    want = norm(jax.grad(nll_fn)(w)) / (norm(jax.grad(g_fn)(w)) + 1e-4)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # clipped + detached: no gradient flows through it
    outer = jax.grad(lambda w: vql.calculate_adaptive_weight(
        lambda v: jnp.mean((decoder_head(v, a) - tgt) ** 2),
        lambda v: -jnp.mean(decoder_head(v, a)), w) * 1.0)(w)
    assert all(float(np.abs(np.asarray(x)).max()) == 0.0
               for x in jax.tree_util.tree_leaves(outer))


def test_forward_with_prehead_consistent():
    from video_llamagen_tpu.tokenizers.vq import model as vq
    params = vq.init_vq_params(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    dec, losses, idx = vq.forward(params, TINY, x, train=True)
    dec2, losses2, idx2, a = vq.forward_with_prehead(params, TINY, x,
                                                     train=True)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    np.testing.assert_allclose(
        np.asarray(vq.decoder_head(params["decoder"]["conv_out"], a)),
        np.asarray(dec), atol=1e-6)


@pytest.mark.parametrize("disc_type", ["patchgan", "stylegan"])
def test_vq_gan_iteration_adaptive_and_disc_types(disc_type):
    """Full dual-optimizer iteration with disc_adaptive_weight ON and both
    discriminator architectures plumbed through gen AND disc losses."""
    mesh = pmesh.make_mesh(MeshConfig(data=8))
    tcfg = TrainConfig(lr=1e-4)
    state = train_vq.create_vq_train_state(jax.random.key(0), TINY, tcfg,
                                           disc_type=disc_type, image_size=32)
    gen_jit, disc_jit = train_vq.make_vq_train_steps(
        TINY, tcfg, mesh, disc_start=0, disc_type=disc_type,
        disc_adaptive_weight=True)
    images = jax.device_put(
        jax.random.normal(jax.random.key(1), (8, 32, 32, 3)),
        pmesh.data_sharding(mesh, 4))
    state, metrics = train_vq.train_iteration(state, images, gen_jit,
                                              disc_jit)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["gen_total"]))
    assert np.isfinite(float(metrics["d_adaptive"]))
    assert float(metrics["d_adaptive"]) >= 0.0
    # the disc branch actually used the selected arch: its grads moved params
    assert np.isfinite(float(metrics["disc"]))
