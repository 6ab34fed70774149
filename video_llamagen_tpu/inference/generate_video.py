"""Compiled video generation loops (t2v) — the three samplers.

1. `generate_ar` — KV-cached AR decode over continuous latents with the
   diffusion head: outer lax.scan over token positions, inner scan over DDPM
   steps (replaces generate_video_diff.py:81-274's two-level Python loop).
2. `generate_ar_mse` — deterministic next-latent decode for the MSE head; this
   is the working `generate_video` the reference lost (sample_t2v_1f.py:28
   imports a module that does not exist).
3. `generate_maskgit` — MaskGIT/MAGE iterative decoding with cosine mask
   schedule and Muse-style linear CFG (ref gpt_video_diff.py:683-794), static
   shapes: every iteration runs the full sequence and updates only the
   positions scheduled for this step.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..diffusion.gaussian import create_diffusion
from ..models import gpt
from ..models.gpt_video import (
    _adapter, diffloss_config, video_freqs, seq_len_video, trunk_forward)
from ..models.diffloss import diffloss_sample


def _cond_combined(params, cfg: GPTConfig, cond_embed: jnp.ndarray,
                   use_cfg: bool) -> jnp.ndarray:
    if not use_cfg:
        return cond_embed
    uncond = gpt.uncond_caption_embedding(params).astype(cond_embed.dtype)
    return jnp.concatenate(
        [cond_embed, jnp.broadcast_to(uncond[None], cond_embed.shape)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "cfg_scale", "temperature", "num_new_tokens"))
def generate_ar(params, cfg: GPTConfig, cond_embed: jnp.ndarray,
                rng: jax.Array, num_new_tokens: Optional[int] = None,
                cfg_scale: float = 1.0, temperature: float = 1.0) -> jnp.ndarray:
    """AR latent generation with the DiffLoss head.

    cond_embed: (B, 120, caption_dim) T5 features.
    Returns latents (B, seq_len, vae_embed_dim).
    """
    use_cfg = cfg_scale > 1.0
    dtype = jnp.dtype(cfg.dtype)
    n_new = num_new_tokens or seq_len_video(cfg)
    t_cond = cfg.cls_token_num
    s_max = t_cond + n_new
    dl_cfg = diffloss_config(cfg)
    gen_diff = create_diffusion(cfg.num_sampling_steps, "cosine")

    freqs_cis = video_freqs(cfg)
    cond2 = _cond_combined(params, cfg, cond_embed, use_cfg)
    batch_cfg = cond2.shape[0]
    cond_emb = gpt.embed_caption(params, cfg, cond2, train=False,
                                 dtype=dtype)[:, :t_cond]

    cache = gpt.init_kv_cache(cfg, batch_cfg, s_max, dtype)
    # prefill over conditioning; trunk vector at last position conditions the
    # first latent (ref generate_video_diff.py:81-95)
    _, cache = gpt.prefill_forward(params, cfg, cond_emb, cache, None, freqs_cis)
    # prefill_forward returns head logits; recover trunk vector via a 1-token
    # re-run is wasteful — instead decode from position t_cond-1's hidden:
    # we recompute z for the last cond position with a dedicated step below.

    def z_to_latent(z, rng):
        """Trunk vector(s) (B_cfg, dim) -> sampled latent (B, vae_dim)."""
        if use_cfg:
            lat = diffloss_sample(params["diffloss"], dl_cfg, z, rng,
                                  temperature=temperature, cfg_scale=cfg_scale)
            return lat[: lat.shape[0] // 2]
        return diffloss_sample(params["diffloss"], dl_cfg, z, rng,
                               temperature=temperature)

    def step(carry, i):
        cache, cur_latent, rng = carry
        pos = t_cond - 1 + i  # position of the token being fed
        lat = jnp.concatenate([cur_latent, cur_latent]) if use_cfg else cur_latent
        tok_emb = _adapter(params["vae_latent_adapter"], lat.astype(dtype))[:, None, :]
        z, cache = _decode_step_trunk(params, cfg, tok_emb, pos, cache, freqs_cis)
        rng, r = jax.random.split(rng)
        nxt = z_to_latent(z.astype(jnp.float32), r)
        return (cache, nxt, rng), nxt

    # first latent: conditioned on the last cond position's trunk vector.
    # We reuse the decode path by feeding the last cond embedding again at
    # position t_cond-1 (its K/V overwrite is idempotent).
    b = cond_embed.shape[0]
    last_cond = cond_emb[:, -1:, :]
    z0, cache = _decode_step_trunk(params, cfg, last_cond,
                                   jnp.asarray(t_cond - 1, jnp.int32), cache,
                                   freqs_cis)
    rng, r0 = jax.random.split(rng)
    lat0 = z_to_latent(z0.astype(jnp.float32), r0)

    (_, _, _), latents = jax.lax.scan(
        step, (cache, lat0, rng), jnp.arange(1, n_new))
    out = jnp.concatenate([lat0[:, None], jnp.moveaxis(latents, 0, 1)], axis=1)
    return out


def _decode_step_trunk(params, cfg: GPTConfig, tok_emb, pos, cache, freqs_cis):
    """One cached trunk step returning the normed hidden (B, dim), not logits.

    Same unrolled per-layer-buffer structure as gpt.decode_step (measured ~4x
    faster than a scan-carried stacked cache on TPU).
    """
    from ..ops.nn import rms_norm, linear
    s_max = gpt.cache_seq_len(cache)
    mask = (jnp.arange(s_max)[None, :] <= pos)[None, None]   # (1,1,1,S)

    freqs = jax.lax.dynamic_slice_in_dim(freqs_cis, pos, 1, axis=0)
    n_rep = cfg.n_head // cfg.kv_heads
    h = tok_emb

    new_cache = []
    for i in range(cfg.n_layer):
        lp = gpt._layer_params(params, i)
        ck, cv = cache[i]["k"], cache[i]["v"]
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = gpt._qkv(lp, cfg, hn, freqs)
        k_row = jnp.transpose(k, (0, 2, 1, 3))
        v_row = jnp.transpose(v, (0, 2, 1, 3))
        ck = jax.lax.dynamic_update_slice(ck, k_row.astype(ck.dtype),
                                          (0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_row.astype(cv.dtype),
                                          (0, 0, pos, 0))
        attn = gpt._decode_attn(q, ck, cv, mask, n_rep)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + gpt._ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
        new_cache.append({"k": ck, "v": cv})

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    return h[:, 0], new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "num_new_tokens"))
def generate_ar_mse(params, cfg: GPTConfig, cond_embed: jnp.ndarray,
                    num_new_tokens: Optional[int] = None) -> jnp.ndarray:
    """Deterministic AR decode for the MSE head (the reference's missing
    generate_video): next latent = vae_latent_adapter2(trunk(h))."""
    dtype = jnp.dtype(cfg.dtype)
    n_new = num_new_tokens or seq_len_video(cfg)
    t_cond = cfg.cls_token_num
    s_max = t_cond + n_new
    freqs_cis = video_freqs(cfg)
    cond_emb = gpt.embed_caption(params, cfg, cond_embed, train=False,
                                 dtype=dtype)[:, :t_cond]
    cache = gpt.init_kv_cache(cfg, cond_emb.shape[0], s_max, dtype)
    _, cache = gpt.prefill_forward(params, cfg, cond_emb, cache, None, freqs_cis)

    def z_to_latent(z):
        return _adapter(params["vae_latent_adapter2"], z).astype(jnp.float32)

    z0, cache = _decode_step_trunk(params, cfg, cond_emb[:, -1:, :],
                                   jnp.asarray(t_cond - 1, jnp.int32), cache,
                                   freqs_cis)
    lat0 = z_to_latent(z0)

    def step(carry, i):
        cache, cur = carry
        pos = t_cond - 1 + i
        tok_emb = _adapter(params["vae_latent_adapter"], cur.astype(dtype))[:, None, :]
        z, cache = _decode_step_trunk(params, cfg, tok_emb, pos, cache, freqs_cis)
        nxt = z_to_latent(z)
        return (cache, nxt), nxt

    (_, _), latents = jax.lax.scan(step, (cache, lat0), jnp.arange(1, n_new))
    return jnp.concatenate([lat0[:, None], jnp.moveaxis(latents, 0, 1)], axis=1)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "num_iter", "cfg_scale", "cfg_schedule", "temperature"))
def generate_maskgit(params, cfg: GPTConfig, cond_embed: jnp.ndarray,
                     rng: jax.Array, num_iter: int = 64,
                     cfg_scale: float = 1.0, cfg_schedule: str = "linear",
                     temperature: float = 1.0) -> jnp.ndarray:
    """MaskGIT iterative decoding (ref gpt_video_diff.py:683-794).

    Cosine mask schedule; fixed raster order (the reference's shuffle is
    disabled at gpt_video_diff.py:709-716); Muse linear CFG ramp. All shapes
    static: each iteration runs the full trunk and the diffusion sampler on
    every position, then commits only the scheduled positions.
    """
    use_cfg = cfg_scale > 1.0
    dtype = jnp.dtype(cfg.dtype)
    seq_len = seq_len_video(cfg)
    b = cond_embed.shape[0]
    dl_cfg = diffloss_config(cfg)
    freqs_cis = video_freqs(cfg)

    cond2 = _cond_combined(params, cfg, cond_embed, use_cfg)
    cond_emb_all = gpt.embed_caption(params, cfg, cond2, train=False,
                                     dtype=dtype)[:, : cfg.cls_token_num]

    mask_tok = params["mask_token"].astype(jnp.float32)
    tokens = jnp.broadcast_to(mask_tok, (b, seq_len, cfg.vae_embed_dim))
    mask = jnp.ones((b, seq_len), jnp.float32)  # 1 = still masked
    order = jnp.broadcast_to(jnp.arange(seq_len)[None], (b, seq_len))

    def iteration(carry, step_i):
        tokens, mask, rng = carry
        toks_in = jnp.concatenate([tokens, tokens]) if use_cfg else tokens
        # trunk over the full sequence (causal, parity with reference
        # forward_decoder attn) — feed [:, :-1] latents after cond
        h = trunk_forward(params, cfg, toks_in[:, :-1].astype(dtype),
                          None, mask=None, train=False, freqs_cis=freqs_cis,
                          cond_embed_precomputed=cond_emb_all)
        z = h[:, cfg.cls_token_num - 1:]

        # cosine schedule for next-round mask count
        ratio = jnp.cos(jnp.pi / 2.0 * (step_i + 1).astype(jnp.float32) / num_iter)
        mask_len = jnp.floor(seq_len * ratio)
        mask_len = jnp.maximum(
            1.0, jnp.minimum(jnp.sum(mask, axis=-1, keepdims=True) - 1,
                             mask_len))[:, 0]                     # (B,)

        pos_rank = jnp.arange(seq_len)[None]                       # raster order
        mask_next = (pos_rank < mask_len[:, None]).astype(jnp.float32)
        is_last = step_i >= num_iter - 1
        mask_to_pred = jnp.where(is_last, mask > 0,
                                 jnp.logical_xor(mask > 0, mask_next > 0))

        if cfg_schedule == "linear":
            cfg_iter = 1.0 + (cfg_scale - 1.0) * (seq_len - mask_len[0]) / seq_len
        else:
            cfg_iter = jnp.asarray(cfg_scale, jnp.float32)

        z_flat = z.reshape(-1, cfg.dim).astype(jnp.float32)
        rng, r = jax.random.split(rng)
        if use_cfg:
            lat = diffloss_sample(params["diffloss"], dl_cfg, z_flat, r,
                                  temperature=temperature, cfg_scale=cfg_iter)
            lat = lat[: lat.shape[0] // 2]
        else:
            lat = diffloss_sample(params["diffloss"], dl_cfg, z_flat, r,
                                  temperature=temperature)
        lat = lat.reshape(b, seq_len, cfg.vae_embed_dim)

        tokens = jnp.where(mask_to_pred[..., None], lat, tokens)
        return (tokens, mask_next, rng), None

    (tokens, _, _), _ = jax.lax.scan(
        iteration, (tokens, mask, rng), jnp.arange(num_iter))
    return tokens
