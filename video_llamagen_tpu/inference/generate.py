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


def _plan_chunks(n_steps: int, t_cond: int, s_max: int,
                 n_chunks: int) -> list:
    """Split the decode scan into (start, length, window) segments with a
    ramped static attention read-window.

    Decode is KV-bandwidth-bound (models/gpt.py _entry_window); a single scan
    streams the full S_max cache every step, costing avg window = 1.0·S_max.
    k linear chunks bring that to ~(k+1)/2k (4 chunks ≈ 0.62) at the price of
    k compiled scan bodies."""
    if n_chunks <= 1 or n_steps <= n_chunks:
        return [(0, n_steps, s_max)]
    base = -(-n_steps // n_chunks)  # ceil
    chunks = []
    start = 0
    while start < n_steps:
        length = min(base, n_steps - start)
        end = start + length
        # last written pos in this chunk = t_cond + end - 1 -> window covers it
        window = min(t_cond + end, s_max)
        chunks.append((start, length, window))
        start = end
    return chunks


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "cfg_scale", "cfg_interval",
                     "temperature", "top_k", "top_p", "sample_logits",
                     "kv_int8", "kv_int4", "kv_merged", "n_chunks"),
)
def generate(params, cfg: GPTConfig, cond: jnp.ndarray, rng: jax.Array,
             max_new_tokens: int,
             emb_masks: Optional[jnp.ndarray] = None,
             cfg_scale: float = 1.0, cfg_interval: int = -1,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
             sample_logits: bool = True, kv_int8: bool = False,
             kv_int4: bool = False, kv_merged: bool = False,
             n_chunks: int = 4) -> jnp.ndarray:
    """Generate image tokens. Returns (B, max_new_tokens) int32.

    cond: (B,) int labels for c2i, (B, T, caption_dim) text features for t2i.
    Semantics match ref generate.py:128-181 (prefill always guided; decode
    steps i > cfg_interval drop guidance when cfg_interval > -1).
    kv_int8 halves KV-cache HBM (per-token int8, ~0.4% quant error);
    kv_int4 quarters it (s4 + per-group K scales, ~7% score noise — see
    models/gpt.init_kv_cache_int4).
    kv_merged stores the cache as (B*KH, S, D) — REQUIRED at GPT-7B dims,
    where the (B,KH,S,D) layout pads 8x and OOMs at compile (see
    models/gpt.init_kv_cache_merged); composes with kv_int8.
    n_chunks: decode-scan segments with ramped KV read-windows (bit-identical
    to n_chunks=1; ~1.3-1.5x decode throughput, +compile time per segment).
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

    if kv_merged:
        cache = (gpt.init_kv_cache_int8_merged(cfg, batch_cfg, s_max)
                 if kv_int8
                 else gpt.init_kv_cache_merged(cfg, batch_cfg, s_max, dtype))
    else:
        cache = (gpt.init_kv_cache_int4(cfg, batch_cfg, s_max) if kv_int4
                 else gpt.init_kv_cache_int8(cfg, batch_cfg, s_max) if kv_int8
                 else gpt.init_kv_cache(cfg, batch_cfg, s_max, dtype))
    logits, cache = gpt.prefill_forward(params, cfg, cond_emb, cache,
                                        prefill_mask, freqs_cis)
    if use_cfg:
        logits = cfg_mix(logits, cfg_scale)
    rng, r0 = jax.random.split(rng)
    next_token = sample_token(r0, logits, temperature, top_k, top_p, sample_logits)

    def make_step(window):
        def step(carry, i):
            cache, cur_token, rng = carry
            pos = t_cond + i
            tok = jnp.concatenate([cur_token, cur_token]) if use_cfg else cur_token
            tok_emb = params["tok_embeddings"][tok][:, None, :].astype(dtype)
            logits, cache = gpt.decode_step(params, cfg, tok_emb, pos, cache,
                                            col_valid, freqs_cis, window=window)
            if use_cfg:
                flag = jnp.logical_or(cfg_interval < 0, i < cfg_interval)
                logits = cfg_mix(logits, cfg_scale, flag)
            rng, r = jax.random.split(rng)
            nxt = sample_token(r, logits, temperature, top_k, top_p, sample_logits)
            return (cache, nxt, rng), nxt
        return step

    carry = (cache, next_token, rng)
    token_chunks = []
    for start, length, window in _plan_chunks(max_new_tokens - 1, t_cond,
                                              s_max, n_chunks):
        carry, toks = jax.lax.scan(make_step(window), carry,
                                   jnp.arange(start, start + length))
        token_chunks.append(toks)
    tokens = jnp.concatenate(token_chunks, axis=0) if token_chunks \
        else jnp.zeros((0, batch_cfg), next_token.dtype)
    # tokens: (steps, B) -> (B, steps); prepend the prefill sample
    seq = jnp.concatenate([next_token[:, None], tokens.T.astype(next_token.dtype)],
                          axis=1)
    return seq.astype(jnp.int32)
