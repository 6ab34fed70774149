"""Video GPT (t2v): heads, masking, samplers — tiny configs on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt_video
from video_llamagen_tpu.inference import generate_video


def make_cfg(head):
    return GPTConfig(dim=32, n_layer=2, n_head=2, vocab_size=64,
                     caption_dim=16, cls_token_num=3, block_size=4,
                     model_type="t2v", vae_embed_dim=4, num_frames=5,
                     t_downsample_size=4, diffloss_d=1, diffloss_w=16,
                     num_sampling_steps="3", diffusion_batch_mul=2,
                     video_head=head, dtype="float32")


SEQ = 4 * 2  # grid 2x2, vae_t=2


@pytest.fixture(scope="module", params=["mse", "diff", "mask_diff", "mask_mse"])
def head_setup(request):
    cfg = make_cfg(request.param)
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    return cfg, params


def test_seq_len():
    cfg = make_cfg("diff")
    assert cfg.vae_t == 2
    assert gpt_video.seq_len_video(cfg) == SEQ


def test_train_loss_finite(head_setup):
    cfg, params = head_setup
    b = 2
    latents = jax.random.normal(jax.random.key(1), (b, SEQ, cfg.vae_embed_dim))
    cond = jax.random.normal(jax.random.key(2), (b, cfg.cls_token_num,
                                                 cfg.caption_dim))
    out, loss = gpt_video.forward_train(params, cfg, latents, cond,
                                        jax.random.key(3))
    assert np.isfinite(float(loss)), (cfg.video_head, float(loss))


def test_train_loss_has_grads():
    cfg = make_cfg("diff")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    latents = jax.random.normal(jax.random.key(1), (1, SEQ, cfg.vae_embed_dim))
    cond = jax.random.normal(jax.random.key(2), (1, cfg.cls_token_num,
                                                 cfg.caption_dim))

    def loss_fn(p):
        _, loss = gpt_video.forward_train(p, cfg, latents, cond, jax.random.key(3))
        return loss

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_random_masking_counts():
    mask = gpt_video.random_masking(jax.random.key(0), 4, 100,
                                    jnp.asarray(0.75))
    assert mask.shape == (4, 100)
    # len_keep = floor(100*0.25) = 25 -> 75 masked per row
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), 75.0)


def test_sample_mask_ratio_bounds():
    rs = [float(gpt_video.sample_mask_ratio(jax.random.key(i), 0.7))
          for i in range(50)]
    assert all(0.7 <= r <= 1.0 for r in rs)
    assert np.mean(rs) > 0.8  # centered near 1.0


def test_generate_ar_shapes():
    cfg = make_cfg("diff")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    cond = jax.random.normal(jax.random.key(1), (2, cfg.cls_token_num,
                                                 cfg.caption_dim))
    lat = generate_video.generate_ar(params, cfg, cond, jax.random.key(2),
                                     cfg_scale=1.5)
    assert lat.shape == (2, SEQ, cfg.vae_embed_dim)
    assert np.isfinite(np.asarray(lat)).all()


def test_generate_ar_mse_shapes():
    cfg = make_cfg("mse")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    cond = jax.random.normal(jax.random.key(1), (1, cfg.cls_token_num,
                                                 cfg.caption_dim))
    lat = generate_video.generate_ar_mse(params, cfg, cond)
    assert lat.shape == (1, SEQ, cfg.vae_embed_dim)
    assert np.isfinite(np.asarray(lat)).all()


def test_generate_maskgit_shapes():
    cfg = make_cfg("mask_diff")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    cond = jax.random.normal(jax.random.key(1), (2, cfg.cls_token_num,
                                                 cfg.caption_dim))
    lat = generate_video.generate_maskgit(params, cfg, cond, jax.random.key(2),
                                          num_iter=4, cfg_scale=2.0)
    assert lat.shape == (2, SEQ, cfg.vae_embed_dim)
    assert np.isfinite(np.asarray(lat)).all()


def test_generate_maskgit_no_cfg():
    cfg = make_cfg("mask_diff")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    cond = jax.random.normal(jax.random.key(1), (1, cfg.cls_token_num,
                                                 cfg.caption_dim))
    lat = generate_video.generate_maskgit(params, cfg, cond, jax.random.key(2),
                                          num_iter=2, cfg_scale=1.0)
    assert lat.shape == (1, SEQ, cfg.vae_embed_dim)


def test_generate_ar_bf16():
    """Samplers also run in the production bf16 dtype."""
    cfg = make_cfg("diff").replace(dtype="bfloat16")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    cond = jax.random.normal(jax.random.key(1), (1, cfg.cls_token_num,
                                                 cfg.caption_dim))
    lat = generate_video.generate_ar(params, cfg, cond, jax.random.key(2),
                                     cfg_scale=1.5)
    assert lat.shape == (1, SEQ, cfg.vae_embed_dim)
    assert np.isfinite(np.asarray(lat)).all()


def test_mse_shuffle_tokens():
    cfg = make_cfg("mse")
    params = gpt_video.init_video_gpt_params(jax.random.key(0), cfg)
    latents = jax.random.normal(jax.random.key(1), (2, SEQ, cfg.vae_embed_dim))
    cond = jax.random.normal(jax.random.key(2), (2, cfg.cls_token_num,
                                                 cfg.caption_dim))
    _, loss = gpt_video.forward_train_mse(params, cfg, latents, cond,
                                          jax.random.key(3),
                                          shuffle_tokens=True)
    assert np.isfinite(float(loss))
