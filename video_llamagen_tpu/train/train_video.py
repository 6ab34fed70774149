"""t2v training: frozen CausalVAE online encode + video GPT under pjit.

Replaces reference autoregressive/train/train_t2v.py (DDP,
find_unused_parameters, GradScaler, fused AdamW) with one compiled step on the
(data, fsdp, tp) mesh: VAE encode (frozen) -> flatten (B, t·h·w, C) ->
video-head loss -> AdamW. bf16 activations make GradScaler unnecessary.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core.config import CausalVAEConfig, GPTConfig, TrainConfig
from ..models import gpt_video
from ..parallel import mesh as pmesh
from ..tokenizers.causal_vae import model as cvae
from .train_state import TrainState, make_optimizer


def create_video_train_state(rng: jax.Array, cfg: GPTConfig,
                             tcfg: TrainConfig) -> TrainState:
    params = gpt_video.init_video_gpt_params(rng, cfg)
    opt_state = make_optimizer(tcfg).init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params) if tcfg.ema else None
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema)


def video_state_shardings(state: TrainState, mesh: Mesh,
                          pp: bool = False) -> TrainState:
    from .train_state import train_state_shardings
    return train_state_shardings(state, mesh, pp=pp)


def encode_videos(vae_params: Dict[str, Any], vae_cfg: CausalVAEConfig,
                  videos: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """(B, T, H, W, 3) -> flattened latents (B, t·h·w, C)
    (ref train_t2v.py:274-280: encode, sample, flatten)."""
    post = cvae.encode(vae_params, vae_cfg, videos)
    z = post.sample(rng)
    b, t, h, w, c = z.shape
    return z.reshape(b, t * h * w, c)


def make_video_train_step(cfg: GPTConfig, tcfg: TrainConfig, mesh: Mesh,
                          state_shardings: TrainState,
                          vae_cfg: Optional[CausalVAEConfig] = None,
                          online_encode: bool = False,
                          shuffle_tokens: bool = False,
                          pp: int = 1, microbatches: int = 1):
    """Compiled t2v step. Batch:
      online_encode: {"video": (B,T,H,W,3), "cond": (B,120,caption_dim)}
      else:          {"latents": (B,L,C),   "cond": (B,120,caption_dim)}
    vae params (frozen) are passed per-call when online_encode.
    `shuffle_tokens`: mse-head any-order training (ref gpt_video.py:374-401).
    pp > 1 runs the trunk as a pp-stage GPipe pipeline (parallel/pp.py);
    pair with video_state_shardings(..., pp=True).
    """
    optimizer = make_optimizer(tcfg)
    pp_ctx = (pp, microbatches, mesh) if pp > 1 else None

    def loss_fn(params, latents, cond, rng):
        _, loss = gpt_video.forward_train(params, cfg, latents, cond, rng,
                                          shuffle_tokens=shuffle_tokens,
                                          pp_ctx=pp_ctx)
        return loss

    def step_fn(state: TrainState, batch, rng: jax.Array,
                vae_params=None):
        rng = jax.random.fold_in(rng, state.step)
        if online_encode:
            r_vae, rng = jax.random.split(rng)
            latents = encode_videos(jax.lax.stop_gradient(vae_params), vae_cfg,
                                    batch["video"], r_vae)
        else:
            latents = batch["latents"]
        loss, grads = jax.value_and_grad(loss_fn)(state.params, latents,
                                                  batch["cond"], rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = tcfg.ema_decay
            ema = jax.tree_util.tree_map(lambda e, p: e * d + p * (1 - d), ema,
                                         params)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    data_sh = lambda ndim: pmesh.data_sharding(mesh, ndim)
    if online_encode:
        batch_sh = {"video": data_sh(5), "cond": data_sh(3)}
        return jax.jit(step_fn,
                       in_shardings=(state_shardings, batch_sh, None, None),
                       out_shardings=(state_shardings, None),
                       donate_argnums=(0,))
    batch_sh = {"latents": data_sh(3), "cond": data_sh(3)}

    def step_fn_latents(state, batch, rng):
        return step_fn(state, batch, rng)

    return jax.jit(step_fn_latents,
                   in_shardings=(state_shardings, batch_sh, None),
                   out_shardings=(state_shardings, None),
                   donate_argnums=(0,))
