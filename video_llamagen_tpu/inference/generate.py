"""Compiled AR generation loop (image GPT, c2i/t2i).

Replaces the reference's per-token Python loop + CUDA-graph capture
(autoregressive/models/generate.py:105-181, serve/model_runner.py:982-1160)
with a single jitted program: prefill + `lax.scan` over decode steps. XLA
amortizes all dispatch; there is no host sync until the final tokens are
fetched. CFG runs as a doubled batch ([cond; uncond]) exactly like
generate.py:129-142, with `cfg_interval` handled in-graph.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..core.rope import precompute_freqs_2d, precompute_freqs_3d_video
from ..models import gpt
from ..ops.sampling import sample_token, cfg_mix


def _freqs_for(cfg: GPTConfig) -> jnp.ndarray:
    if cfg.model_type in ("c2i", "t2i"):
        return precompute_freqs_2d(cfg.grid_size, cfg.head_dim, cfg.rope_base,
                                   cfg.cls_token_num)
    return precompute_freqs_3d_video(cfg.grid_size, cfg.vae_t, cfg.head_dim,
                                     cfg.rope_base, cfg.cls_token_num)


def _build_cond_combined(params, cfg: GPTConfig, cond: jnp.ndarray, cfg_scale: float):
    """[cond; null-cond] batch for CFG (ref generate.py:129-147)."""
    if cfg.model_type == "c2i":
        if cfg_scale > 1.0:
            cond_null = jnp.full_like(cond, cfg.num_classes)
            return jnp.concatenate([cond, cond_null], axis=0)
        return cond
    # t2i: null condition is the learned uncond embedding
    if cfg_scale > 1.0:
        uncond = gpt.uncond_caption_embedding(params).astype(cond.dtype)
        cond_null = jnp.broadcast_to(uncond[None], cond.shape)
        return jnp.concatenate([cond, cond_null], axis=0)
    return cond


def _prefill_mask(t: int, s_max: int, emb_masks: Optional[jnp.ndarray],
                  batch: int) -> tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Build (prefill_mask (B,1,T,T), col_valid (B,S_max)).

    Mirrors the causal-mask surgery of ref generate.py:156-165: padded-text
    columns are masked everywhere, and the diagonal is forced on so padded-text
    query rows still attend to themselves (keeps softmax finite).
    """
    if emb_masks is None:
        return None, None
    emb = emb_masks.astype(jnp.bool_)                      # (B, T)
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    m = causal[None] & emb[:, None, :]                     # (B, T, T)
    eye = jnp.eye(t, dtype=jnp.bool_)
    m = m | eye[None]
    col_valid = jnp.concatenate(
        [emb, jnp.ones((batch, s_max - t), jnp.bool_)], axis=1)
    return m[:, None], col_valid


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "cfg_scale", "cfg_interval",
                     "temperature", "top_k", "top_p", "sample_logits",
                     "kv_int8"),
)
def generate(params, cfg: GPTConfig, cond: jnp.ndarray, rng: jax.Array,
             max_new_tokens: int,
             emb_masks: Optional[jnp.ndarray] = None,
             cfg_scale: float = 1.0, cfg_interval: int = -1,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
             sample_logits: bool = True, kv_int8: bool = False) -> jnp.ndarray:
    """Generate image tokens. Returns (B, max_new_tokens) int32.

    cond: (B,) int labels for c2i, (B, T, caption_dim) text features for t2i.
    Semantics match ref generate.py:128-181 (prefill always guided; decode
    steps i > cfg_interval drop guidance when cfg_interval > -1).
    kv_int8 halves KV-cache HBM (per-token int8, ~0.4% quant error).
    """
    dtype = jnp.dtype(cfg.dtype)
    use_cfg = cfg_scale > 1.0
    batch = cond.shape[0]
    t_cond = 1 if cfg.model_type == "c2i" else cond.shape[1]
    s_max = t_cond + max_new_tokens

    freqs_cis = _freqs_for(cfg)
    cond_combined = _build_cond_combined(params, cfg, cond, cfg_scale)
    batch_cfg = cond_combined.shape[0]

    cond_emb = gpt.embed_cond(params, cfg, cond_combined, train=False, dtype=dtype)

    if emb_masks is not None and use_cfg:
        emb_masks2 = jnp.concatenate([emb_masks, emb_masks], axis=0)
    else:
        emb_masks2 = emb_masks
    prefill_mask, col_valid = _prefill_mask(t_cond, s_max, emb_masks2, batch_cfg)

    cache = (gpt.init_kv_cache_int8(cfg, batch_cfg, s_max) if kv_int8
             else gpt.init_kv_cache(cfg, batch_cfg, s_max, dtype))
    logits, cache = gpt.prefill_forward(params, cfg, cond_emb, cache,
                                        prefill_mask, freqs_cis)
    if use_cfg:
        logits = cfg_mix(logits, cfg_scale)
    rng, r0 = jax.random.split(rng)
    next_token = sample_token(r0, logits, temperature, top_k, top_p, sample_logits)

    def step(carry, i):
        cache, cur_token, rng = carry
        pos = t_cond + i
        tok = jnp.concatenate([cur_token, cur_token]) if use_cfg else cur_token
        tok_emb = params["tok_embeddings"][tok][:, None, :].astype(dtype)
        logits, cache = gpt.decode_step(params, cfg, tok_emb, pos, cache,
                                        col_valid, freqs_cis)
        if use_cfg:
            flag = jnp.logical_or(cfg_interval < 0, i < cfg_interval)
            logits = cfg_mix(logits, cfg_scale, flag)
        rng, r = jax.random.split(rng)
        nxt = sample_token(r, logits, temperature, top_k, top_p, sample_logits)
        return (cache, nxt, rng), nxt

    (_, _, _), tokens = jax.lax.scan(
        step, (cache, next_token, rng), jnp.arange(max_new_tokens - 1))
    # tokens: (steps, B) -> (B, steps); prepend the prefill sample
    seq = jnp.concatenate([next_token[:, None], tokens.T.astype(next_token.dtype)],
                          axis=1)
    return seq.astype(jnp.int32)
