"""Speculative decoding: draft-model propose, target-model verify.

The serving-side capability the reference's vLLM base ships as its flagship
latency feature (and the natural next step past the ramped-window decode of
inference/generate.py). A small draft GPT (e.g. GPT-B) proposes K tokens with
K cheap cached steps; the target (e.g. GPT-L/XL/3B) scores all K+1 positions
in ONE `models/gpt.decode_block_multi` pass — streaming its weights and KV
cache once per K+1 positions instead of once per token. On this chip decode
is KV/weight-bandwidth-bound (models/gpt.py _entry_window measurements), so
accepted-token rate ~ a_rate*(K+1) directly multiplies tok/s at small batch.

Correctness: standard rejection-sampling speculative decoding (Leviathan et
al.) — accept draft token d_j with prob min(1, p(d_j)/q(d_j)); at the first
rejection resample from norm(max(p-q, 0)); if all K accepted, sample a bonus
token from the target's K+1-th distribution. The emitted stream is
distributed EXACTLY as target-only sampling (tests/test_speculative.py pins
the greedy case bit-equal to inference/generate.generate and checks the
stochastic case distributionally). CFG runs as the usual doubled batch in
BOTH models, and acceptance is computed on the guided+filtered distributions
(the ones sampling actually uses).

Cache bookkeeping: rejected draft rows are left STALE in both KV caches —
provably harmless: the next block starts at pos' = pos + n_accepted + 1 and
rewrites [pos', pos'+K] in the draft loop and [pos', pos'+K] in the verify
pass, covering every stale row, and the block-causal mask never reads past
the current position. The one row that scheme misses is the draft cache at
pos+K after a fully-accepted block (the target's verify writes it; the
draft's K-step loop stops one short) — a cheap tail write in the block body
covers it, otherwise self-draft acceptance silently drops below 1.0.

Limitations (documented, not silent): per-row emb_masks (t2i padded text)
and cfg_interval are not supported here — use generate() for those paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..models import gpt
from ..ops.sampling import cfg_mix, logits_to_probs
from .generate import _freqs_for, _build_cond_combined


def _probs(logits, cfg_scale, temperature, top_k, top_p):
    """Guided + filtered sampling distribution from raw [cond;uncond] logits."""
    if cfg_scale > 1.0:
        logits = cfg_mix(logits, cfg_scale)
    return logits_to_probs(logits, temperature, top_k, top_p)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "max_new_tokens", "spec_k",
                     "cfg_scale", "temperature", "top_k", "top_p",
                     "sample_logits", "kv_int8", "kv_int4", "draft_kv_int8",
                     "return_stats"),
)
def spec_generate(params, cfg: GPTConfig, draft_params, draft_cfg: GPTConfig,
                  cond: jnp.ndarray, rng: jax.Array, max_new_tokens: int,
                  spec_k: int = 4,
                  cfg_scale: float = 1.0, temperature: float = 1.0,
                  top_k: int = 0, top_p: float = 1.0,
                  sample_logits: bool = True,
                  kv_int8: bool = False,
                  kv_int4: bool = False,
                  draft_kv_int8: bool = False,
                  return_stats: bool = False):
    """Generate (B, max_new_tokens) int32 tokens, draft+verify.

    Output-distribution-equivalent to inference/generate.generate with the
    same sampling params (bit-equal when sample_logits=False). cond: (B,)
    labels (c2i) or (B, T, caption_dim) features (t2i, full-length captions).
    return_stats=True additionally returns {"drafted": total draft proposals
    over active rows, "accepted": how many of them were accepted, "blocks":
    verify passes summed over active rows} — acceptance rate = accepted /
    drafted, the number that decides whether a draft model pays off.
    """
    assert cfg.model_type == draft_cfg.model_type
    assert cfg.vocab_size == draft_cfg.vocab_size
    assert cfg.cls_token_num == draft_cfg.cls_token_num
    K = spec_k
    dtype = jnp.dtype(cfg.dtype)
    ddtype = jnp.dtype(draft_cfg.dtype)
    use_cfg = cfg_scale > 1.0
    batch = cond.shape[0]
    t_cond = 1 if cfg.model_type == "c2i" else cond.shape[1]
    s_max = t_cond + max_new_tokens + K + 1

    freqs_t = _freqs_for(cfg)
    freqs_d = _freqs_for(draft_cfg)

    # ---- prefill both models on the conditioning ---------------------------
    cond_t = _build_cond_combined(params, cfg, cond, cfg_scale)
    cond_d = _build_cond_combined(draft_params, draft_cfg, cond, cfg_scale)
    b_cfg = cond_t.shape[0]

    cache_t = (gpt.init_kv_cache_int4(cfg, b_cfg, s_max) if kv_int4
               else gpt.init_kv_cache_int8(cfg, b_cfg, s_max) if kv_int8
               else gpt.init_kv_cache(cfg, b_cfg, s_max, dtype))
    cache_d = (gpt.init_kv_cache_int8(draft_cfg, b_cfg, s_max)
               if draft_kv_int8
               else gpt.init_kv_cache(draft_cfg, b_cfg, s_max, ddtype))

    emb_t = gpt.embed_cond(params, cfg, cond_t, train=False, dtype=dtype)
    emb_d = gpt.embed_cond(draft_params, draft_cfg, cond_d, train=False,
                           dtype=ddtype)
    logits_t, cache_t = gpt.prefill_forward(params, cfg, emb_t, cache_t,
                                            None, freqs_t)
    _, cache_d = gpt.prefill_forward(draft_params, draft_cfg, emb_d, cache_d,
                                     None, freqs_d)

    p0 = _probs(logits_t, cfg_scale, temperature, top_k, top_p)
    rng, r0 = jax.random.split(rng)
    if sample_logits:
        first = jax.random.categorical(r0, jnp.log(p0 + 1e-30), axis=-1)
    else:
        first = jnp.argmax(p0, axis=-1)

    W = max_new_tokens + 1  # last column is the dump slot for masked writes
    out0 = jnp.zeros((batch, W), jnp.int32)
    out0 = out0.at[:, 0].set(first.astype(jnp.int32))

    rows = jnp.arange(batch)

    def dup(x):
        return jnp.concatenate([x, x], axis=0) if use_cfg else x

    def cond_fn(carry):
        n_out = carry[3]
        return jnp.min(n_out) < max_new_tokens

    def body_fn(carry):
        cache_t, cache_d, cur, n_out, out, rng, stats = carry
        active = n_out < max_new_tokens                       # (B,)
        active2 = dup(active)
        # cur's (unwritten) cache row position; clamped for finished rows
        pos = t_cond + jnp.minimum(n_out, max_new_tokens) - 1  # (B,)
        pos2 = dup(pos)

        # ---- draft K tokens with K cached steps ----------------------------
        drafts = []
        q_list = []
        tok_j = cur
        for j in range(K):
            e = draft_params["tok_embeddings"][dup(tok_j)][:, None].astype(
                ddtype)
            lg, cache_d = gpt.decode_step_multi(
                draft_params, draft_cfg, e, pos2 + j, cache_d, active2,
                freqs_d)
            qj = _probs(lg, cfg_scale, temperature, top_k, top_p)   # (B,V)
            rng, r = jax.random.split(rng)
            if sample_logits:
                dj = jax.random.categorical(r, jnp.log(qj + 1e-30), axis=-1)
            else:
                dj = jnp.argmax(qj, axis=-1)
            drafts.append(dj)
            q_list.append(qj)
            tok_j = dj
        # tail write: put d_{K-1}'s KV at row pos+K. Without it, an
        # all-K-accepted block leaves that row stale in the DRAFT cache
        # (the next block starts at pos+K+1 and never rewrites it), and the
        # draft silently degrades — self-draft acceptance drops below 1.0
        # (caught by tests/test_speculative.py::test_spec_stats). One cheap
        # extra draft step; its logits are unused.
        e = draft_params["tok_embeddings"][dup(tok_j)][:, None].astype(ddtype)
        _, cache_d = gpt.decode_step_multi(
            draft_params, draft_cfg, e, pos2 + K, cache_d, active2, freqs_d)
        d = jnp.stack(drafts, axis=1)                         # (B,K)
        q = jnp.stack(q_list, axis=1)                         # (B,K,V)

        # ---- verify: ONE target pass over [cur, d_0..d_{K-1}] --------------
        blk = jnp.concatenate([cur[:, None], d], axis=1)      # (B,K+1)
        be = params["tok_embeddings"][dup(blk)].astype(dtype)
        lg_blk, cache_t = gpt.decode_block_multi(
            params, cfg, be, pos2, cache_t, active2, freqs_t)  # (B?,K+1,V)
        # per-position guidance+filtering
        v = lg_blk.shape[-1]
        p = _probs(lg_blk.reshape(-1, v), cfg_scale, temperature, top_k,
                   top_p)
        p = p.reshape(batch, K + 1, v)                        # (B,K+1,V)

        # ---- rejection sampling acceptance ---------------------------------
        p_d = jnp.take_along_axis(p[:, :K], d[..., None], axis=-1)[..., 0]
        q_d = jnp.take_along_axis(q, d[..., None], axis=-1)[..., 0]
        if sample_logits:
            rng, r = jax.random.split(rng)
            u = jax.random.uniform(r, (batch, K))
            acc = u * q_d < p_d                               # u < p/q
        else:
            acc = d == jnp.argmax(p[:, :K], axis=-1)
        keep = jnp.cumprod(acc.astype(jnp.int32), axis=1)     # (B,K)
        n = keep.sum(axis=1)                                  # accepted count

        # fallback/bonus distribution at slot n (q padded with 0 at slot K,
        # so n==K yields resid == p[:,K] — the bonus distribution)
        q_pad = jnp.concatenate([q, jnp.zeros((batch, 1, v))], axis=1)
        p_n = jnp.take_along_axis(
            p, n[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        q_n = jnp.take_along_axis(
            q_pad, n[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        resid = jnp.maximum(p_n - q_n, 0.0)
        rs = resid.sum(axis=-1, keepdims=True)
        resid = jnp.where(rs > 0, resid / jnp.maximum(rs, 1e-30), p_n)
        rng, r = jax.random.split(rng)
        if sample_logits:
            final = jax.random.categorical(r, jnp.log(resid + 1e-30), axis=-1)
        else:
            final = jnp.argmax(p_n, axis=-1)

        # ---- emit accepted drafts + final ----------------------------------
        d_pad = jnp.concatenate(
            [d, jnp.zeros((batch, 1), d.dtype)], axis=1)      # (B,K+1)
        for i in range(K + 1):
            tok_i = jnp.where(i < n, d_pad[:, i], final).astype(jnp.int32)
            valid = active & (i <= n) & (n_out + i < max_new_tokens)
            idx = jnp.where(valid, n_out + i, W - 1)
            out = out.at[rows, idx].set(
                jnp.where(valid, tok_i, out[rows, idx]))
        adv = jnp.where(active, n + 1, 0)
        n_out = n_out + adv
        cur = jnp.where(active, final.astype(cur.dtype), cur)
        n_active = active.sum().astype(jnp.int32)
        stats = stats + jnp.stack([K * n_active,
                                   jnp.where(active, n, 0).sum()
                                   .astype(jnp.int32),
                                   n_active])
        return (cache_t, cache_d, cur, n_out, out, rng, stats)

    n_out0 = jnp.ones((batch,), jnp.int32)
    carry = (cache_t, cache_d, first.astype(jnp.int32), n_out0, out0, rng,
             jnp.zeros((3,), jnp.int32))
    carry = jax.lax.while_loop(cond_fn, body_fn, carry)
    out = carry[4][:, :max_new_tokens]
    if return_stats:
        s = carry[6]
        return out, {"drafted": s[0], "accepted": s[1], "blocks": s[2]}
    return out
