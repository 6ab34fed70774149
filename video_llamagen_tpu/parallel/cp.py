"""Context-parallel trunk: shard the t·h·w token axis over the `cp` mesh axis.

The reference only has dead sequence-parallel vestiges (modules.py:184-218,
undefined symbols). This is the live TPU equivalent for long-video training
(SURVEY.md §5): the full sequence (cond + latents) is sharded over `cp`;
every transformer block runs ring attention (ops/attention.ring_attention —
KV blocks rotate via ppermute, online-softmax merge), so activation memory
per chip scales as S/N while attention stays exactly causal.

Composable with data parallelism: call inside pjit with batch sharded over
(data, fsdp) and sequence over cp.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import GPTConfig
from ..models import gpt
from ..ops.attention import ring_attention
from ..ops.nn import rms_norm, linear

Params = Dict[str, Any]


def _block_ring(lp: Params, cfg: GPTConfig, h: jnp.ndarray,
                freqs_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """One transformer block with ring attention over the cp axis."""
    hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
    q, k, v = gpt._qkv(lp, cfg, hn, freqs_local)
    n_rep = cfg.n_head // cfg.kv_heads
    attn = ring_attention(q, gpt._repeat_kv(k, n_rep),
                          gpt._repeat_kv(v, n_rep), axis_name=axis_name,
                          causal=True)
    attn = attn.reshape(h.shape[0], h.shape[1], cfg.dim)
    h = h + linear(attn, lp["attention"]["wo"])
    return h + gpt._ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))


def cp_trunk_forward(params: Params, cfg: GPTConfig, embeds: jnp.ndarray,
                     mesh: Mesh, freqs_cis: jnp.ndarray,
                     axis_name: str = "cp") -> jnp.ndarray:
    """Full-sequence trunk with the sequence axis sharded over `cp`.

    embeds: (B, S, dim) already-embedded sequence (cond + adapted latents),
    S divisible by the cp axis size. Returns normed hidden (B, S, dim) with
    the same sharding.
    """
    n_cp = mesh.shape[axis_name]
    s = embeds.shape[1]
    assert s % n_cp == 0, (s, n_cp)
    s_local = s // n_cp

    def sharded(emb, freqs):
        idx = jax.lax.axis_index(axis_name)
        # per-shard RoPE rows: global positions [idx*s_local, ...)
        f_local = jax.lax.dynamic_slice_in_dim(freqs, idx * s_local, s_local,
                                               axis=0)
        h = emb

        def body(h, lp):
            return _block_ring(lp, cfg, h, f_local, axis_name), None

        h, _ = jax.lax.scan(body, h, params["layers"])
        return rms_norm(h, params["norm"], cfg.norm_eps)

    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, None, None)),
        out_specs=P(None, axis_name, None),
        check_rep=False,
    )
    return fn(embeds, freqs_cis[:s])


def cp_video_loss(params: Params, cfg: GPTConfig, video_latent: jnp.ndarray,
                  cond_embed: jnp.ndarray, mesh: Mesh, rng: jax.Array,
                  axis_name: str = "cp") -> jnp.ndarray:
    """MSE-head t2v loss with the sequence sharded over cp.

    video_latent (B, L, vae_dim) where cls_token_num + L is divisible by the
    cp axis; pads the trailing position like the dense path ([:, :-1] inputs).
    """
    from ..models.gpt_video import _adapter, video_freqs
    dtype = jnp.dtype(cfg.dtype)
    cond_emb = gpt.embed_caption(params, cfg, cond_embed, train=False,
                                 dtype=dtype)[:, : cfg.cls_token_num]
    tok = _adapter(params["vae_latent_adapter"],
                   video_latent[:, :-1].astype(dtype))
    embeds = jnp.concatenate([cond_emb, tok], axis=1)
    h = cp_trunk_forward(params, cfg, embeds, mesh, video_freqs(cfg),
                         axis_name)
    h = _adapter(params["vae_latent_adapter2"], h)
    pred = h[:, cfg.cls_token_num - 1:]
    return jnp.mean((pred.astype(jnp.float32)
                     - video_latent.astype(jnp.float32)) ** 2)
