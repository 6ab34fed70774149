"""CausalVAE training losses: per-frame LPIPS + 3D GAN discriminator + KL.

Capability parity with reference CausalVideoVAE/causalvideovae/model/losses/
(LPIPSWithDiscriminator3D, perceptual_loss.py:198-335: L1 recon + LPIPS per
frame + KL + 3D-conv discriminator with adopt_weight warmup;
discriminator.py NLayerDiscriminator3D).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.nn import init_conv, group_norm
from ..vq.losses import (adopt_weight, hinge_d_loss, vanilla_d_loss,
                         lpips as lpips_2d)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# 3D PatchGAN discriminator (ref discriminator.py NLayerDiscriminator3D)
# ---------------------------------------------------------------------------

def init_disc3d_params(rng: jax.Array, input_nc: int = 3, ndf: int = 64,
                       n_layers: int = 3) -> Params:
    r = iter(jax.random.split(rng, n_layers + 3))
    layers = [{"conv": init_conv(next(r), (3, 4, 4, input_nc, ndf))}]
    nf_mult = 1
    for n in range(1, n_layers + 1):
        nf_prev, nf_mult = nf_mult, min(2 ** n, 8)
        cin, cout = ndf * nf_prev, ndf * nf_mult
        layers.append({
            "conv": init_conv(next(r), (3, 4, 4, cin, cout)),
            "norm": {"scale": jnp.ones((cout,), jnp.float32),
                     "bias": jnp.zeros((cout,), jnp.float32)},
        })
    layers.append({"conv": init_conv(next(r), (3, 4, 4, ndf * nf_mult, 1))})
    return {"layers": layers}


def disc3d_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, H, W, C) -> patch logits."""

    def conv(x, cp, strides):
        out = jax.lax.conv_general_dilated(
            x, cp["kernel"].astype(x.dtype), strides,
            padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + cp["bias"].astype(x.dtype)

    layers = p["layers"]
    n = len(layers) - 2
    h = jax.nn.leaky_relu(conv(x, layers[0]["conv"], (1, 2, 2)), 0.2)
    for i, layer in enumerate(layers[1:-1]):
        strides = (1, 2, 2) if i < n - 1 else (1, 1, 1)
        h = conv(h, layer["conv"], strides)
        h = group_norm(h, layer["norm"]["scale"], layer["norm"]["bias"])
        h = jax.nn.leaky_relu(h, 0.2)
    return conv(h, layers[-1]["conv"], (1, 1, 1))


# ---------------------------------------------------------------------------
# Composite VAE-GAN loss (ref perceptual_loss.py LPIPSWithDiscriminator3D)
# ---------------------------------------------------------------------------

def vae_generator_loss(disc_params: Params, lpips_params: Optional[Params],
                       inputs: jnp.ndarray, recons: jnp.ndarray,
                       posterior_kl: jnp.ndarray, global_step: jnp.ndarray,
                       kl_weight: float = 1e-6, perceptual_weight: float = 1.0,
                       disc_weight: float = 0.5, disc_start: int = 50001,
                       logvar: Optional[jnp.ndarray] = None):
    """inputs/recons (B, T, H, W, 3) in [-1, 1]; posterior_kl (B,)."""
    rec = jnp.abs(inputs.astype(jnp.float32) - recons.astype(jnp.float32))
    if lpips_params is not None:
        b, t = inputs.shape[:2]
        flat_in = inputs.reshape(b * t, *inputs.shape[2:])
        flat_rec = recons.reshape(b * t, *recons.shape[2:])
        p_loss = lpips_2d(lpips_params, flat_rec, flat_in).reshape(b, t)
        p_loss = p_loss.mean()
    else:
        p_loss = jnp.zeros(())
    # nll with learnable logvar (ref perceptual_loss.py uses exp(-logvar))
    lv = logvar if logvar is not None else jnp.zeros(())
    nll = jnp.mean(rec / jnp.exp(lv) + lv)
    kl = posterior_kl.mean()

    logits_fake = disc3d_forward(disc_params, recons)
    g_loss = -jnp.mean(logits_fake)
    d_weight = adopt_weight(disc_weight, global_step, disc_start)

    total = nll + perceptual_weight * p_loss + kl_weight * kl + d_weight * g_loss
    parts = {"nll": nll, "perceptual": p_loss, "kl": kl, "gen_adv": g_loss,
             "d_weight": d_weight}
    return total, parts


def vae_discriminator_loss(disc_params: Params, inputs: jnp.ndarray,
                           recons: jnp.ndarray, global_step: jnp.ndarray,
                           disc_start: int = 50001,
                           disc_loss_type: str = "hinge"):
    logits_real = disc3d_forward(disc_params, inputs)
    logits_fake = disc3d_forward(disc_params, jax.lax.stop_gradient(recons))
    fn = hinge_d_loss if disc_loss_type == "hinge" else vanilla_d_loss
    d_loss = adopt_weight(1.0, global_step, disc_start) * fn(logits_real,
                                                             logits_fake)
    return d_loss, {"disc": d_loss,
                    "logits_real": jnp.mean(logits_real),
                    "logits_fake": jnp.mean(logits_fake)}
