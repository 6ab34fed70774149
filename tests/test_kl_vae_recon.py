"""KL-VAE (SD-VAE baseline) + reconstruction eval pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llamagen_tpu.tokenizers import kl_vae
from video_llamagen_tpu.tokenizers.vq import model as vq
from video_llamagen_tpu.core.config import VQConfig
from video_llamagen_tpu.evals.reconstruction import (
    reconstruction_eval, vq_roundtrip_fn)


def test_kl_vae_roundtrip_shapes():
    cfg = kl_vae.kl_vae_config(embed_dim=2, ch=8, num_res_blocks=1,
                               encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2),
                               dtype="float32")
    params = kl_vae.init_kl_vae_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
    post = kl_vae.encode(params, cfg, x)
    assert post.mean.shape == (1, 8, 8, 2)
    dec, post2 = kl_vae.forward(params, cfg, x, jax.random.key(2))
    assert dec.shape == x.shape
    assert float(post2.kl()[0]) >= 0


def test_reconstruction_eval_pipeline(tmp_path):
    cfg = VQConfig(ch=8, z_channels=8, codebook_size=16, codebook_embed_dim=4,
                   encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2),
                   num_res_blocks=1, dtype="float32")
    params = vq.init_vq_params(jax.random.key(0), cfg)
    fn = vq_roundtrip_fn(params, cfg)
    rs = np.random.RandomState(0)
    batches = [rs.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
               for _ in range(2)]
    out = reconstruction_eval(fn, batches,
                              sample_npz_path=str(tmp_path / "s.npz"),
                              ref_npz_path=str(tmp_path / "r.npz"))
    assert out["n"] == 4
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])
    s = np.load(tmp_path / "s.npz")["arr_0"]
    assert s.shape == (4, 16, 16, 3) and s.dtype == np.uint8
