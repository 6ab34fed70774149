"""2D KL autoencoder (SD-VAE architecture) — baseline image tokenizer.

Capability parity with reference tokenizer/vae/ (diffusers AutoencoderKL used
as a reconstruction baseline): the same VQGAN conv backbone as the VQ
tokenizer but with a diagonal-Gaussian bottleneck (double_z) instead of a
codebook. Reuses tokenizers/vq building blocks.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.config import VQConfig
from .causal_vae.model import DiagonalGaussian
from .vq import model as vq

Params = Dict[str, Any]


def kl_vae_config(embed_dim: int = 4, **kw) -> VQConfig:
    """SD-VAE shape: f8, z=4 channels doubled at the encoder output."""
    base = dict(encoder_ch_mult=(1, 2, 4, 4), decoder_ch_mult=(1, 2, 4, 4),
                z_channels=2 * embed_dim, codebook_embed_dim=embed_dim)
    base.update(kw)
    return VQConfig(**base)


def init_kl_vae_params(rng: jax.Array, cfg: VQConfig) -> Params:
    r = jax.random.split(rng, 4)
    # encoder emits 2*z for (mean, logvar); decoder consumes z
    enc_cfg = cfg
    dec_cfg = cfg.replace(z_channels=cfg.z_channels // 2)
    return {
        "encoder": vq.init_encoder(r[0], enc_cfg),
        "decoder": vq.init_decoder(r[1], dec_cfg),
        "quant_conv": vq._init_conv2d(r[2], 1, 1, cfg.z_channels,
                                      2 * cfg.codebook_embed_dim),
        "post_quant_conv": vq._init_conv2d(r[3], 1, 1, cfg.codebook_embed_dim,
                                           cfg.z_channels // 2),
    }


def encode(params: Params, cfg: VQConfig, x: jnp.ndarray) -> DiagonalGaussian:
    h = vq.encoder_forward(params["encoder"], cfg, x)
    moments = vq.conv2d(h, params["quant_conv"])
    return DiagonalGaussian(moments)


def decode(params: Params, cfg: VQConfig, z: jnp.ndarray) -> jnp.ndarray:
    dec_cfg = cfg.replace(z_channels=cfg.z_channels // 2)
    h = vq.conv2d(z, params["post_quant_conv"])
    return vq.decoder_forward(params["decoder"], dec_cfg, h)


def forward(params: Params, cfg: VQConfig, x: jnp.ndarray, rng: jax.Array,
            sample_posterior: bool = True):
    post = encode(params, cfg, x)
    z = post.sample(rng) if sample_posterior else post.mode()
    return decode(params, cfg, z), post
