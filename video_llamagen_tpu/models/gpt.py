"""Llama-style autoregressive image GPT (c2i / t2i) — TPU-native.

Capability parity with reference autoregressive/models/gpt.py (RMSNorm, SwiGLU
with multiple_of=256 rounding, fused-QKV attention with GQA, 2D RoPE with a
zeroed cls-token prefix, class/caption conditioning with CFG dropout, CE loss
with `valid` masking, zero-init output head, model zoo gpt.py:441-470) — but a
different architecture:

* pure functional: params are a pytree; no module state, no buffers;
* transformer blocks are **stacked** along a leading layer axis and executed
  with `jax.lax.scan` — O(1) compile time in depth, FSDP/TP-shardable with one
  rule per weight name (parallel/mesh.py);
* the KV cache is an explicit pytree threaded through the compiled decode step
  (inference/generate.py) instead of mutable nn.Module buffers
  (ref gpt.py:170-185);
* computation in bfloat16, float32 master params, RMSNorm/softmax in float32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..core.rope import precompute_freqs_2d, apply_rotary_emb
from ..ops.nn import (
    rms_norm, linear, silu, gelu_tanh, dropout, drop_path,
    init_linear, init_embedding,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_block_params(rng: jax.Array, cfg: GPTConfig) -> Params:
    """One transformer block. Weight layout: (in, out)."""
    r = jax.random.split(rng, 5)
    h = cfg.ffn_hidden
    total_kv_dim = (cfg.n_head + 2 * cfg.kv_heads) * cfg.head_dim
    std = cfg.initializer_range
    return {
        "attention": {
            "wqkv": init_linear(r[0], cfg.dim, total_kv_dim, std),
            "wo": init_linear(r[1], cfg.dim, cfg.dim, std),
        },
        "ffn": {
            "w1": init_linear(r[2], cfg.dim, h, std),
            "w3": init_linear(r[3], cfg.dim, h, std),
            "w2": init_linear(r[4], h, cfg.dim, std),
        },
        "attention_norm": jnp.ones((cfg.dim,), jnp.float32),
        "ffn_norm": jnp.ones((cfg.dim,), jnp.float32),
    }


def init_gpt_params(rng: jax.Array, cfg: GPTConfig) -> Params:
    out = init_gpt_params_nonlayer(rng, cfg)
    # stacked blocks: every leaf gets a leading (n_layer,) axis
    layer_rngs = jax.random.split(jax.random.split(rng, 4)[1], cfg.n_layer)
    out["layers"] = jax.vmap(lambda k: init_block_params(k, cfg))(layer_rngs)
    return out


def init_gpt_params_nonlayer(rng: jax.Array, cfg: GPTConfig) -> Params:
    """Everything but the stacked blocks, with init_gpt_params' exact key
    splits — fabricate_gpt_params scans the blocks separately."""
    r = jax.random.split(rng, 4)
    std = cfg.initializer_range

    # conditioning embedder (ref gpt.py:56-115)
    if cfg.model_type == "c2i":
        cls_embedding = {
            # +1 row: the CFG null class (ref LabelEmbedder, gpt.py:62)
            "embedding": init_embedding(r[0], cfg.num_classes + 1, cfg.dim, std),
        }
    elif cfg.model_type in ("t2i", "t2v"):
        rr = jax.random.split(r[0], 3)
        cls_embedding = {
            "uncond_embedding": (
                jax.random.normal(rr[0], (cfg.cls_token_num, cfg.caption_dim))
                / cfg.caption_dim ** 0.5
            ).astype(jnp.float32),
            "cap_proj": {
                "fc1": init_linear(rr[1], cfg.caption_dim, cfg.dim, std),
                "fc2": init_linear(rr[2], cfg.dim, cfg.dim, std),
            },
        }
    else:
        raise ValueError(f"unknown model_type {cfg.model_type}")

    return {
        "cls_embedding": cls_embedding,
        "tok_embeddings": init_embedding(r[2], cfg.vocab_size, cfg.dim, std),
        "norm": jnp.ones((cfg.dim,), jnp.float32),
        # zero-init head (ref gpt.py:302-307)
        "output": init_linear(r[3], cfg.dim, cfg.vocab_size, std, zero=True),
    }


def cast_params(params: Params, dtype) -> Params:
    """Cast float params for inference (bf16 weights halve decode HBM traffic).

    Quantized leaves (int8 QuantizedLinear / int4 QuantizedLinear4) pass
    through untouched: their scales are f32 by design (ops/quant.py) and
    casting them would make a pre-quantized tree numerically diverge from
    engine-side quantization on bf16 engines."""
    from ..ops.quant import is_quantized_leaf as is_q
    return jax.tree_util.tree_map(
        lambda x: x if is_q(x)
        else x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params, is_leaf=is_q,
    )


def fabricate_gpt_params(rng: jax.Array, cfg: GPTConfig, dtype=jnp.bfloat16,
                         quant: str | None = None, group: int = 128) -> Params:
    """init -> cast -> quantize with LAYER-SEQUENTIAL peak memory.

    `quantize_gpt_params*(cast_params(init_gpt_params(k)))` under one jit
    vmaps the block init over all layers, so XLA materializes the full
    stacked f32 tree plus quant temporaries at once — GPT-7B's FFN init
    alone is a f32[32,4096,11008] (5.4 GB) temp and the fused fabrication
    OOMs the 16 GB chip (results_chain/gpt7b_w4_kv8.log). Here the blocks
    run through a lax.scan: one layer is initialized, cast, and quantized
    per iteration, so peak HBM is the FINAL tree + one layer of f32 temps.

    Uses the exact key-split discipline of init_gpt_params, so the output
    equals quantize(cast(init)) leaf-for-leaf (tests pin this). quant in
    (None, "int8", "int4", "int4_packed"); call under jit.
    """
    from ..ops.quant import quantize_weight, quantize_weight4

    if quant == "int8":
        qfn = quantize_weight
    elif quant == "int4":
        qfn = lambda w: quantize_weight4(w, group)
    elif quant == "int4_packed":
        from ..ops.qmatmul4 import pack_int4
        qfn = lambda w: pack_int4(quantize_weight4(w, group))
    elif quant is None:
        qfn = None
    else:
        raise ValueError(f"unknown quant mode {quant!r}")

    def cast(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    def one_layer(_, k):
        blk = cast(init_block_params(k, cfg))
        if qfn is not None:
            blk = dict(blk,
                       attention={"wqkv": qfn(blk["attention"]["wqkv"]),
                                  "wo": qfn(blk["attention"]["wo"])},
                       ffn={nm: qfn(blk["ffn"][nm])
                            for nm in ("w1", "w3", "w2")})
        return None, blk

    full = init_gpt_params_nonlayer(rng, cfg)
    layer_rngs = jax.random.split(jax.random.split(rng, 4)[1], cfg.n_layer)
    _, layers = jax.lax.scan(one_layer, None, layer_rngs)
    full = cast(full)
    if qfn is not None:
        full["output"] = qfn(full["output"])
    full["layers"] = layers
    return full


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Conditioning embedders
# ---------------------------------------------------------------------------

def embed_class(params: Params, cfg: GPTConfig, labels: jnp.ndarray,
                rng: Optional[jax.Array] = None, train: bool = False) -> jnp.ndarray:
    """(B,) int labels -> (B, 1, dim); CFG dropout at train (ref gpt.py:56-83)."""
    if train and cfg.class_dropout_prob > 0 and rng is not None:
        drop = jax.random.uniform(rng, labels.shape) < cfg.class_dropout_prob
        labels = jnp.where(drop, cfg.num_classes, labels)
    emb = params["cls_embedding"]["embedding"][labels]
    return emb[:, None, :]


def embed_caption(params: Params, cfg: GPTConfig, caption: jnp.ndarray,
                  rng: Optional[jax.Array] = None, train: bool = False,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, T, caption_dim) T5 features -> (B, T, dim) (ref gpt.py:89-115)."""
    ce = params["cls_embedding"]
    if train and cfg.class_dropout_prob > 0 and rng is not None:
        drop = jax.random.uniform(rng, (caption.shape[0],)) < cfg.class_dropout_prob
        caption = jnp.where(drop[:, None, None],
                            ce["uncond_embedding"].astype(caption.dtype), caption)
    x = caption.astype(dtype)
    x = gelu_tanh(linear(x, ce["cap_proj"]["fc1"]))
    return linear(x, ce["cap_proj"]["fc2"])


def embed_cond(params: Params, cfg: GPTConfig, cond: jnp.ndarray,
               rng: Optional[jax.Array] = None, train: bool = False,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    if cfg.model_type == "c2i":
        emb = embed_class(params, cfg, cond, rng, train).astype(dtype)
    else:
        emb = embed_caption(params, cfg, cond, rng, train, dtype)
    return emb[:, : cfg.cls_token_num]


def uncond_caption_embedding(params: Params) -> jnp.ndarray:
    return params["cls_embedding"]["uncond_embedding"]


# ---------------------------------------------------------------------------
# Attention / block (shared by full-seq forward and cached decode)
# ---------------------------------------------------------------------------

def _qkv(block: Params, cfg: GPTConfig, x: jnp.ndarray,
         freqs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: (B,S,dim) -> q (B,S,H,D), k/v (B,S,KH,D) with RoPE applied to q,k."""
    b, s, _ = x.shape
    kv_size = cfg.kv_heads * cfg.head_dim
    qkv = linear(x, block["attention"]["wqkv"])
    q, k, v = jnp.split(qkv, [cfg.dim, cfg.dim + kv_size], axis=-1)
    q = q.reshape(b, s, cfg.n_head, cfg.head_dim)
    k = k.reshape(b, s, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.kv_heads, cfg.head_dim)
    q = apply_rotary_emb(q, freqs)
    k = apply_rotary_emb(k, freqs)
    return q, k, v


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=2)


def _attn_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """q (B,Sq,H,D), k/v (B,Sk,H,D), mask bool (..., Sq, Sk) -> (B,Sq,H*D).

    Softmax in float32; additive -inf masking like SDPA with attn_mask.
    """
    b, sq, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # rows fully masked (padded-text queries before the forced diagonal) -> 0
    probs = jnp.nan_to_num(probs)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.reshape(b, sq, h * d)


def _ffn(block: Params, x: jnp.ndarray) -> jnp.ndarray:
    f = block["ffn"]
    return linear(silu(linear(x, f["w1"])) * linear(x, f["w3"]), f["w2"])


def block_forward(block: Params, cfg: GPTConfig, x: jnp.ndarray,
                  freqs: jnp.ndarray, mask: Optional[jnp.ndarray],
                  rngs: Optional[Dict[str, jax.Array]] = None,
                  train: bool = False, dp_rate=0.0) -> jnp.ndarray:
    """Full-sequence block (training / prefill without cache).

    On TPU with long sequences this dispatches to the Pallas flash-attention
    kernel (ops/attention); the einsum path is the exact fallback.
    """
    h = rms_norm(x, block["attention_norm"], cfg.norm_eps)
    q, k, v = _qkv(block, cfg, h, freqs)
    n_rep = cfg.n_head // cfg.kv_heads
    from ..ops.attention import multi_head_attention
    attn = multi_head_attention(q, _repeat_kv(k, n_rep),
                                _repeat_kv(v, n_rep), mask=mask, causal=True)
    attn = attn.reshape(x.shape[0], x.shape[1], cfg.dim)
    attn = linear(attn, block["attention"]["wo"])
    if train and rngs is not None:
        attn = dropout(rngs.get("resid"), attn, cfg.resid_dropout_p, not train)
        attn = drop_path(rngs.get("drop_path"), attn, dp_rate, not train)
    x = x + attn
    f = _ffn(block, rms_norm(x, block["ffn_norm"], cfg.norm_eps))
    if train and rngs is not None:
        f = dropout(rngs.get("ffn"), f, cfg.ffn_dropout_p, not train)
        f = drop_path(rngs.get("drop_path2"), f, dp_rate, not train)
    return x + f


# ---------------------------------------------------------------------------
# Full-sequence forward (training + naive inference)
# ---------------------------------------------------------------------------

def make_causal_mask(seq_len: int) -> jnp.ndarray:
    return jnp.tril(jnp.ones((seq_len, seq_len), jnp.bool_))


def forward(params: Params, cfg: GPTConfig,
            idx: Optional[jnp.ndarray],
            cond: jnp.ndarray,
            targets: Optional[jnp.ndarray] = None,
            mask: Optional[jnp.ndarray] = None,
            valid: Optional[jnp.ndarray] = None,
            rng: Optional[jax.Array] = None,
            train: bool = False,
            freqs_cis: Optional[jnp.ndarray] = None):
    """Training / full-context forward (ref gpt.py:334-385).

    idx:   (B, block_size-?) int tokens or None (cond-only prefill)
    cond:  (B,) labels for c2i, (B, T, caption_dim) features for t2i
    mask:  optional bool (B, 1, S, S) attention mask; defaults to causal
    returns (logits, loss) — logits (B, T_img, vocab) truncated to start at the
    last conditioning position, so logits[:, i] predicts image token i.
    """
    dtype = jnp.dtype(cfg.dtype)
    rngs = {}
    if rng is not None:
        keys = jax.random.split(rng, 6)
        rngs = dict(zip(["cond", "tok", "resid", "ffn", "drop_path", "drop_path2"], keys))

    cond_emb = embed_cond(params, cfg, cond, rngs.get("cond"), train, dtype)
    if idx is not None:
        tok = params["tok_embeddings"][idx].astype(dtype)
        h = jnp.concatenate([cond_emb, tok], axis=1)
    else:
        h = cond_emb
    if train:
        h = dropout(rngs.get("tok"), h, cfg.token_dropout_p, not train)

    seq_len = h.shape[1]
    if freqs_cis is None:
        freqs_cis = precompute_freqs_2d(cfg.grid_size, cfg.head_dim, cfg.rope_base,
                                        cfg.cls_token_num)
    freqs = freqs_cis[:seq_len]
    # mask stays None for the pure-causal case: ops/attention then uses the
    # flash kernel (no (S,S) mask materialization); block_forward's dispatcher
    # applies causality itself

    dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.n_layer)

    def body(carry, xs):
        layer_params, dp_rate = xs
        h = block_forward(layer_params, cfg, carry, freqs, mask, rngs or None,
                          train, dp_rate)
        return h, None

    block_fn = body
    if cfg.remat and train:
        block_fn = jax.checkpoint(body)
    h, _ = jax.lax.scan(block_fn, h, (params["layers"], dp_rates))

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)
    logits = logits[:, cfg.cls_token_num - 1:]

    loss = None
    if targets is not None:
        loss = cross_entropy_loss(logits[:, : targets.shape[1]], targets, valid)
    return logits, loss


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE with optional per-sample `valid` weighting (ref gpt.py:378-384)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if valid is not None:
        w = jnp.broadcast_to(valid[:, None].astype(jnp.float32), nll.shape)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    return nll.mean()


# ---------------------------------------------------------------------------
# KV-cached decode (used by inference/generate.py)
# ---------------------------------------------------------------------------

def init_kv_cache(cfg: GPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """Per-layer SEPARATE cache buffers in (B, KH, S, D) layout.

    Design note (measured on TPU): a stacked (L, ...) cache moved through
    lax.scan xs/ys is fully copied every step (~4x step time for GPT-L);
    per-layer buffers updated in place inside an unrolled layer loop run at
    the weight-streaming floor. (B, KH, S, D) makes q·K a contiguous batched
    matmul over D with no transpose.
    """
    shape = (batch, cfg.kv_heads, max_seq, cfg.head_dim)
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(cfg.n_layer)]


def init_kv_cache_int8(cfg: GPTConfig, batch: int, max_seq: int):
    """int8 KV cache, SEQ-MINOR layout: kT/vT are (B, KH, D, S) with
    per-token, per-head scales (B, KH, S). Half the HBM of bf16.

    Why seq-minor (measured on TPU): for s8 arrays in the bf16 cache's
    (B, KH, S, D) shape XLA picks a {3,1,2,0} layout whose 128-lane dim is
    D=64 — every buffer PADS 2.0x, so int8 reads stream the same bytes as
    bf16, and the compiler keeps compressed args + uncompressed HLO-temp
    copies of all 2*n_layer buffers (GPT-L 256 rows: 13.8 GB of temp copies
    -> compile OOM at 21.4 GB). With S minor the lane pad is 577->640 (11%),
    there is nothing to compress, and int8 truly halves the KV stream.
    The TPU analog of vLLM's kv_cache_dtype=int8 (ref model_runner.py /
    cache config). Every read/write path dispatches statically on the entry
    structure ({k,v} bf16 vs {kT,kT_scale,vT,vT_scale} int8), so both cache
    kinds share one decode implementation.
    """
    shape = (batch, cfg.kv_heads, cfg.head_dim, max_seq)
    sshape = (batch, cfg.kv_heads, max_seq)
    return [{"kT": jnp.zeros(shape, jnp.int8),
             "kT_scale": jnp.zeros(sshape, jnp.bfloat16),
             "vT": jnp.zeros(shape, jnp.int8),
             "vT_scale": jnp.zeros(sshape, jnp.bfloat16)}
            for _ in range(cfg.n_layer)]


def init_kv_cache_merged(cfg: GPTConfig, batch: int, max_seq: int,
                         dtype=jnp.bfloat16):
    """bf16 KV cache with batch and kv-head MERGED: (B*KH, S, D).

    Why this exists (measured, results_chain/gpt7b_w4_b8_r4.log): at GPT-7B
    dims the (B, KH, S, D) cache at batch 8 (16 CFG rows) gets XLA layout
    {0,3,1,2} — batch lands in the 128-lane dim and every one of the 64
    post-prefill cache temps pads 8.0x (72 MB -> 577 MB, 28.9 GB of HLO
    temps -> compile OOM). The seq-minor int8 layout has the dual failure
    (KH=32 in lanes, 4x). The root cause is that at 7B scale every cache dim
    except S and D is SMALL, and XLA keeps electing a small dim as the lane
    dim. Merging B*KH (= 512 at 7B batch-8-CFG) removes every small dim from
    the buffer shape: any layout choice tiles near-perfectly (512 / 577 /
    128), so padding is bounded at ~1-11% regardless of what the compiler
    picks. Row index is b * KH + kh (b-major), so per-batch-row blocks stay
    contiguous for prefill writes and engine row copies.

    GQA bonus: grouped q (B*KH, n_rep*T, D) against (B*KH, S, D) needs NO
    jnp.repeat of K/V — the n_rep query heads of a group share the cache
    rows directly as a batched matmul.
    """
    shape = (batch * cfg.kv_heads, max_seq, cfg.head_dim)
    return [{"km": jnp.zeros(shape, dtype), "vm": jnp.zeros(shape, dtype)}
            for _ in range(cfg.n_layer)]


def init_kv_cache_int8_merged(cfg: GPTConfig, batch: int, max_seq: int):
    """int8 KV cache in the merged (B*KH, S, D) layout with per-token scales
    (B*KH, S). Same layout-robustness argument as init_kv_cache_merged; with
    D=128 (GPT-2B/3B/7B head_dim) the s8 lane dim is exact, so this variant
    both halves KV bytes AND avoids the 7B-dims padding blowup that the
    seq-minor kT layout hits (KH in lanes, 4x)."""
    shape = (batch * cfg.kv_heads, max_seq, cfg.head_dim)
    sshape = (batch * cfg.kv_heads, max_seq)
    return [{"km": jnp.zeros(shape, jnp.int8),
             "km_scale": jnp.zeros(sshape, jnp.bfloat16),
             "vm": jnp.zeros(shape, jnp.int8),
             "vm_scale": jnp.zeros(sshape, jnp.bfloat16)}
            for _ in range(cfg.n_layer)]


KV_INT4_GROUP = 16  # channels per int4 scale group (D=64 -> 4 groups)


def init_kv_cache_int4(cfg: GPTConfig, batch: int, max_seq: int):
    """int4 KV cache, seq-minor like int8 but s4 elements — XLA packs s4
    two-per-byte on TPU, so the KV stream QUARTERS vs bf16.

    Quarter-byte quantization needs finer scales than int8's per-token amax:
    K gets per-token per-GROUP scales ((B, KH, G, S), G = D/KV_INT4_GROUP)
    so an outlier channel only poisons its own 16-channel group (the KIVI/
    KVQuant finding that K error is channel-structured); V keeps per-token
    scales (V tolerates 4-bit per-token, same literature). Score noise is
    ~1/14 relative per element (vs ~1/254 for int8) — tests pin the logits
    budget and the serving ladder measures the FID cost. Projection from the
    measured batch-128 ladder (bf16 8154 -> int8 12404 tok/s => KV ~2/3 of
    the decode stream): int4 lands ~16k tok/s if the s4 dots stream packed.
    The TPU analog of vLLM's 4-bit KV quantization work.
    """
    g = cfg.head_dim // KV_INT4_GROUP
    shape = (batch, cfg.kv_heads, cfg.head_dim, max_seq)

    # One jit for the whole tree: EAGER s4 zeros crashes over the axon
    # tunnel ("Recursively calling jit" from the weak-scalar -> s4
    # convert_element_type eager dispatch, results_chain/probe_kv4.log);
    # under jit the fill lowers normally, and the outputs are distinct
    # buffers (donation-safe — verified, no XLA output aliasing).
    def mk():
        return [{"kT4": jnp.zeros(shape, jnp.int4),
                 "kT4_scale": jnp.zeros((batch, cfg.kv_heads, g, max_seq),
                                        jnp.bfloat16),
                 "vT4": jnp.zeros(shape, jnp.int4),
                 "vT4_scale": jnp.zeros((batch, cfg.kv_heads, max_seq),
                                        jnp.bfloat16)}
                for _ in range(cfg.n_layer)]

    return jax.jit(mk)()


def cache_seq_len(cache) -> int:
    e = cache[0]
    if "km" in e:
        return e["km"].shape[1]
    if "kT4" in e:
        return e["kT4"].shape[3]
    return e["kT"].shape[3] if "kT" in e else e["k"].shape[2]


def entry_seq_axis(name: str, ndim: int) -> int:
    """Seq axis of a cache-entry tensor: last for seq-minor (kT/vT) names,
    1 for merged (km/vm), 2 for the bf16 (B,KH,S,D) layout. Engine slot
    copy/swap helpers use this to stay layout-agnostic."""
    if name.startswith(("km", "vm")):
        return 1
    return ndim - 1 if name.startswith(("kT", "vT")) else 2


def _quantize_kv(x: jnp.ndarray):
    """Symmetric per-row int8: x (..., D) -> (int8 (..., D), scale (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_kv4(x: jnp.ndarray):
    """Symmetric per-group int4: x (..., D) -> (s4 (..., D), scale (..., G))
    with G = D / KV_INT4_GROUP groups along the channel axis."""
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    g = d // KV_INT4_GROUP
    xg = xf.reshape(*x.shape[:-1], g, KV_INT4_GROUP)
    amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 7.0
    q = jnp.clip(jnp.round(xg / scale), -7, 7).astype(jnp.int4)
    return q.reshape(x.shape), scale[..., 0]


def _quantize_kv4_pertoken(x: jnp.ndarray):
    """Symmetric per-row int4 (the V side of the int4 cache):
    x (..., D) -> (s4 (..., D), scale (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 7.0
    q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int4)
    return q, scale


def _entry_window(entry, window: Optional[int]):
    """Static read-window slice of a cache entry along the seq axis.

    Decode attention masks columns > pos but still STREAMS the whole (B,KH,
    S_max,D) buffer from HBM each step. Decode is KV-bandwidth-bound (measured
    GPT-L batch-8 @577: 16 CFG rows = 7.88 ms/step, 8 rows = 4.64 ms — ~0.4
    ms/row is KV traffic), so reading only a prefix window that covers the
    current position cuts the dominant term. Callers pick a static `window`
    per scan segment (inference/generate.py ramps it across chunks)."""
    if "km" in entry:
        if window is None or window >= entry["km"].shape[1]:
            return entry
        return {name: x[:, :window] for name, x in entry.items()}
    if "kT" in entry or "kT4" in entry:
        key = "kT" if "kT" in entry else "kT4"
        if window is None or window >= entry[key].shape[3]:
            return entry
        return {name: x[..., :window] for name, x in entry.items()}
    if window is None or window >= entry["k"].shape[2]:
        return entry
    return {name: x[:, :, :window] for name, x in entry.items()}


def entry_kv(entry, kv_heads: Optional[int] = None):
    """Read a cache entry as attend-able (B,KH,S,D) bf16 K/V, dequantizing
    and/or un-transposing as needed (tests + debug; the hot paths read the
    native layout directly). Merged (km/vm) entries need `kv_heads` to
    unflatten the (B*KH, S, D) rows."""
    if "km" in entry:
        km, vm = entry["km"], entry["vm"]
        if "km_scale" in entry:
            km = km.astype(jnp.bfloat16) * entry["km_scale"].astype(
                jnp.bfloat16)[..., None]
            vm = vm.astype(jnp.bfloat16) * entry["vm_scale"].astype(
                jnp.bfloat16)[..., None]
        if kv_heads is None:
            raise ValueError("merged cache entry needs kv_heads to unflatten")
        m, s, d = km.shape
        b = m // kv_heads
        return (km.reshape(b, kv_heads, s, d).astype(jnp.bfloat16),
                vm.reshape(b, kv_heads, s, d).astype(jnp.bfloat16))
    if "kT4" in entry:
        b, kh, d, s = entry["kT4"].shape
        g = d // KV_INT4_GROUP
        kv = jnp.swapaxes(entry["kT4"], 2, 3).astype(jnp.float32)  # (B,KH,S,D)
        ks = jnp.swapaxes(entry["kT4_scale"], 2, 3).astype(jnp.float32)
        ck = (kv.reshape(b, kh, s, g, KV_INT4_GROUP)
              * ks[..., None]).reshape(b, kh, s, d).astype(jnp.bfloat16)
        cv = (jnp.swapaxes(entry["vT4"], 2, 3).astype(jnp.bfloat16)
              * entry["vT4_scale"].astype(jnp.bfloat16)[..., None])
        return ck, cv
    if "kT" in entry:
        ck = jnp.swapaxes(entry["kT"], 2, 3).astype(jnp.bfloat16) \
            * entry["kT_scale"].astype(jnp.bfloat16)[..., None]
        cv = jnp.swapaxes(entry["vT"], 2, 3).astype(jnp.bfloat16) \
            * entry["vT_scale"].astype(jnp.bfloat16)[..., None]
        return ck, cv
    if "k_scale" in entry:
        ck = entry["k"].astype(jnp.bfloat16) * entry["k_scale"].astype(
            jnp.bfloat16)
        cv = entry["v"].astype(jnp.bfloat16) * entry["v_scale"].astype(
            jnp.bfloat16)
        return ck, cv
    return entry["k"], entry["v"]


def _cache_write(entry, k_r: jnp.ndarray, v_r: jnp.ndarray, batch_off,
                 seq_off):
    """Contiguous write of rows k_r/v_r (B', KH, T, D) at [batch_off ...,
    seq_off:seq_off+T] (layout-aware)."""
    dus = jax.lax.dynamic_update_slice
    if "km" in entry:
        bp, kh, t, d = k_r.shape
        km_r = k_r.reshape(bp * kh, t, d)
        vm_r = v_r.reshape(bp * kh, t, d)
        row_off = batch_off * kh
        if "km_scale" in entry:
            kq, ks = _quantize_kv(km_r)               # (M,T,D),(M,T,1)
            vq, vs = _quantize_kv(vm_r)
            sd = entry["km_scale"].dtype
            return {"km": dus(entry["km"], kq, (row_off, seq_off, 0)),
                    "km_scale": dus(entry["km_scale"], ks[..., 0].astype(sd),
                                    (row_off, seq_off)),
                    "vm": dus(entry["vm"], vq, (row_off, seq_off, 0)),
                    "vm_scale": dus(entry["vm_scale"], vs[..., 0].astype(sd),
                                    (row_off, seq_off))}
        return {"km": dus(entry["km"], km_r.astype(entry["km"].dtype),
                          (row_off, seq_off, 0)),
                "vm": dus(entry["vm"], vm_r.astype(entry["vm"].dtype),
                          (row_off, seq_off, 0))}
    if "kT4" in entry:
        kq, ks = _quantize_kv4(k_r)                    # (B,KH,T,D),(B,KH,T,G)
        vq, vs = _quantize_kv4_pertoken(v_r)           # (B,KH,T,D),(B,KH,T,1)
        sd = entry["kT4_scale"].dtype
        return {"kT4": dus(entry["kT4"], jnp.swapaxes(kq, 2, 3),
                           (batch_off, 0, 0, seq_off)),
                "kT4_scale": dus(entry["kT4_scale"], jnp.swapaxes(
                    ks, 2, 3).astype(sd), (batch_off, 0, 0, seq_off)),
                "vT4": dus(entry["vT4"], jnp.swapaxes(vq, 2, 3),
                           (batch_off, 0, 0, seq_off)),
                "vT4_scale": dus(entry["vT4_scale"], vs[..., 0].astype(sd),
                                 (batch_off, 0, seq_off))}
    if "kT" in entry:
        kq, ks = _quantize_kv(k_r)                     # (B,KH,T,D),(B,KH,T,1)
        vq, vs = _quantize_kv(v_r)
        sd = entry["kT_scale"].dtype
        return {"kT": dus(entry["kT"], jnp.swapaxes(kq, 2, 3),
                          (batch_off, 0, 0, seq_off)),
                "kT_scale": dus(entry["kT_scale"], ks[..., 0].astype(sd),
                                (batch_off, 0, seq_off)),
                "vT": dus(entry["vT"], jnp.swapaxes(vq, 2, 3),
                          (batch_off, 0, 0, seq_off)),
                "vT_scale": dus(entry["vT_scale"], vs[..., 0].astype(sd),
                                (batch_off, 0, seq_off))}
    start = (batch_off, 0, seq_off, 0)
    if "k_scale" in entry:
        kq, ks = _quantize_kv(k_r)
        vq, vs = _quantize_kv(v_r)
        sd = entry["k_scale"].dtype
        return {"k": dus(entry["k"], kq, start),
                "k_scale": dus(entry["k_scale"], ks.astype(sd), start),
                "v": dus(entry["v"], vq, start),
                "v_scale": dus(entry["v_scale"], vs.astype(sd), start)}
    return {"k": dus(entry["k"], k_r.astype(entry["k"].dtype), start),
            "v": dus(entry["v"], v_r.astype(entry["v"].dtype), start)}


def _cache_write_slots(entry, k_new: jnp.ndarray, v_new: jnp.ndarray,
                       batch_ids: jnp.ndarray, pos: jnp.ndarray,
                       active: jnp.ndarray):
    """Per-slot scatter at [b, :, pos[b], :]; inactive slots keep old rows.

    k_new/v_new: (B, KH, D)."""
    if "km" in entry:
        raise NotImplementedError(
            "per-slot scatter writes are not implemented for the merged "
            "cache; serving drives merged entries through the frozen-window "
            "path (window_sources + commit_entry)")
    gate = active[:, None, None]
    out = dict(entry)
    if "kT4" in entry:
        sd = entry["kT4_scale"].dtype
        kq, ks = _quantize_kv4(k_new)                    # (B,KH,D),(B,KH,G)
        kq = jnp.where(gate, kq, entry["kT4"][batch_ids, :, :, pos])
        ks2 = jnp.where(gate, ks.astype(sd),
                        entry["kT4_scale"][batch_ids, :, :, pos])
        out["kT4"] = entry["kT4"].at[batch_ids, :, :, pos].set(kq)
        out["kT4_scale"] = entry["kT4_scale"].at[batch_ids, :, :, pos].set(ks2)
        vq, vs = _quantize_kv4_pertoken(v_new)           # (B,KH,D),(B,KH,1)
        vq = jnp.where(gate, vq, entry["vT4"][batch_ids, :, :, pos])
        vs2 = jnp.where(active[:, None], vs[..., 0].astype(sd),
                        entry["vT4_scale"][batch_ids, :, pos])
        out["vT4"] = entry["vT4"].at[batch_ids, :, :, pos].set(vq)
        out["vT4_scale"] = entry["vT4_scale"].at[batch_ids, :, pos].set(vs2)
        return out
    if "kT" in entry:
        sd = entry["kT_scale"].dtype
        for name, x in (("kT", k_new), ("vT", v_new)):
            q, s = _quantize_kv(x)                       # (B,KH,D),(B,KH,1)
            q = jnp.where(gate, q, entry[name][batch_ids, :, :, pos])
            s2 = jnp.where(active[:, None], s[..., 0].astype(sd),
                           entry[name + "_scale"][batch_ids, :, pos])
            out[name] = entry[name].at[batch_ids, :, :, pos].set(q)
            out[name + "_scale"] = entry[name + "_scale"].at[
                batch_ids, :, pos].set(s2)
        return out
    if "k_scale" in entry:
        sd = entry["k_scale"].dtype
        for name, x in (("k", k_new), ("v", v_new)):
            q, s = _quantize_kv(x)
            q = jnp.where(gate, q, entry[name][batch_ids, :, pos])
            s = jnp.where(gate[..., :1], s.astype(sd),
                          entry[name + "_scale"][batch_ids, :, pos])
            out[name] = entry[name].at[batch_ids, :, pos].set(q)
            out[name + "_scale"] = entry[name + "_scale"].at[
                batch_ids, :, pos].set(s)
        return out
    for name, x in (("k", k_new), ("v", v_new)):
        w = jnp.where(gate, x.astype(entry[name].dtype),
                      entry[name][batch_ids, :, pos])
        out[name] = entry[name].at[batch_ids, :, pos].set(w)
    return out


def _layer_params(params: Params, i: int) -> Params:
    """Static-index slice of the stacked layer pytree (free: feeds consumers
    directly as an offset view)."""
    return jax.tree_util.tree_map(lambda x: x[i], params["layers"])


def _decode_attn(q, ck, cv, mask, n_rep: int):
    """q (B,T,H,D) against cache (B,KH,S,D); mask (..,1,T|1,S) bool.

    Natural-layout batched matvec (T=1 decode) / small matmul (T>1
    speculative verify): contraction over D reads K contiguously.
    """
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qh = jnp.transpose(q, (0, 2, 1, 3))                       # (B,H,T,D)
    if n_rep > 1:
        ck = jnp.repeat(ck, n_rep, axis=1)
        cv = jnp.repeat(cv, n_rep, axis=1)
    scores = jnp.einsum("bhqd,bhsd->bhqs", qh, ck).astype(jnp.float32) * scale
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhqs,bhsd->bhqd", probs.astype(cv.dtype), cv)
    return jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, t, h * d)


def _q_merged(q, n_rep: int):
    """q (B,T,H,D) -> (B*KH, n_rep*T, D) with heads grouped (KH, n_rep) —
    matches _repeat_kv's head->kv-head mapping (kh = h // n_rep)."""
    b, t, h, d = q.shape
    kh = h // n_rep
    qh = jnp.transpose(q, (0, 2, 1, 3))                # (B,H,T,D)
    return qh.reshape(b * kh, n_rep * t, d), b, t, h, kh


def _attn_out_merged(attn_m, b, t, h, kh, n_rep):
    """(B*KH, n_rep*T, D) -> (B, T, H*D), inverting _q_merged's grouping."""
    d = attn_m.shape[-1]
    a = attn_m.reshape(b, kh, n_rep, t, d)
    return jnp.transpose(a, (0, 3, 1, 2, 4)).reshape(b, t, h * d)


def _mask_merged(mask, scores5):
    """Broadcast a (B|1, 1, T|1, S) decode mask over (B, KH, R, T, S)."""
    return jnp.broadcast_to(mask[:, :, None], scores5.shape)


def _decode_attn_merged(q, entry, mask, n_rep: int):
    """Decode attention over the merged bf16 cache (km/vm: (B*KH, S, D)).

    One batched (n_rep*T, D) x (S, D)^T matmul per merged row; GQA groups
    read their shared KV rows with no jnp.repeat. See init_kv_cache_merged
    for why this layout exists (7B-dims padding blowup)."""
    km, vm = entry["km"], entry["vm"]
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    qm, b, t, h, kh = _q_merged(q, n_rep)
    s = km.shape[1]
    scores = jnp.einsum("mrd,msd->mrs", qm, km).astype(jnp.float32) * scale
    scores5 = scores.reshape(b, kh, n_rep, t, s)
    scores5 = jnp.where(_mask_merged(mask, scores5), scores5, -jnp.inf)
    probs = jax.nn.softmax(scores5, axis=-1)
    pm = probs.reshape(b * kh, n_rep * t, s).astype(vm.dtype)
    attn = jnp.einsum("mrs,msd->mrd", pm, vm)
    return _attn_out_merged(attn.astype(q.dtype), b, t, h, kh, n_rep)


def _decode_attn_int8_merged(q, entry, mask, n_rep: int):
    """Fused int8 decode attention over the merged cache (km/vm s8
    (B*KH, S, D) + per-token scales (B*KH, S)). Same
    quantize-the-tiny-side structure as _decode_attn_int8 (see its
    docstring): both dots run s8 x s8 with int32 accumulation, and no
    dequantized bf16 copy of the cache ever materializes."""
    km, ks = entry["km"], entry["km_scale"]
    vm, vs = entry["vm"], entry["vm_scale"]
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    qm, b, t, h, kh = _q_merged(q, n_rep)
    s = km.shape[1]
    q8, qs = _quantize_kv(qm)                          # s8, (M,R,1)
    si = jnp.einsum("mrd,msd->mrs", q8, km,
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    scores = si * qs.astype(jnp.float32)
    scores = scores * ks[:, None, :].astype(jnp.float32) * scale
    scores5 = scores.reshape(b, kh, n_rep, t, s)
    scores5 = jnp.where(_mask_merged(mask, scores5), scores5, -jnp.inf)
    probs = jax.nn.softmax(scores5, axis=-1)
    pv = probs.reshape(b * kh, n_rep * t, s) * vs[:, None, :].astype(
        jnp.float32)
    p8, ps = _quantize_kv(pv)
    attn_i = jnp.einsum("mrs,msd->mrd", p8, vm,
                        preferred_element_type=jnp.int32)
    attn = attn_i.astype(jnp.float32) * ps.astype(jnp.float32)
    return _attn_out_merged(attn.astype(q.dtype), b, t, h, kh, n_rep)


def _decode_attn_int8(q, entry, mask, n_rep: int):
    """Fused int8 decode attention: both dots run int8 x int8 on the MXU.

    Dequantizing the int8 cache into bf16 before the dot (ck = kq * ks)
    materializes a full-size bf16 copy in HBM — XLA cannot fuse a convert
    into a dot operand — which is why the naive int8 cache measured only
    +5.6% (GPT-L batch-8: 7.46 vs 7.88 ms/step). Instead quantize the tiny
    side of each dot (q rows; prob·v_scale rows) and keep the big side int8:

      scores[s] = qs·ks[s] · dot_int8(q8, K8[s,:])        (int32 accumulate)
      attn[d]   = ps       · dot_int8(p8, V8[:,d])   with p = probs·vs

    so the (B,KH,S,D) int8 buffers stream at half the bf16 bytes and no
    dequantized copy ever exists. Extra quantization error: ~1/254 relative
    per element on q and per prob row (tests pin logits to the bf16 cache
    within the same budget as plain int8 KV).
    """
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    kq, ks = entry["k"], entry["k_scale"]
    vq, vs = entry["v"], entry["v_scale"]
    if n_rep > 1:
        kq = jnp.repeat(kq, n_rep, axis=1)
        ks = jnp.repeat(ks, n_rep, axis=1)
        vq = jnp.repeat(vq, n_rep, axis=1)
        vs = jnp.repeat(vs, n_rep, axis=1)

    qh = jnp.transpose(q, (0, 2, 1, 3))                        # (B,H,T,D)
    q8, qs = _quantize_kv(qh)                                  # int8, (B,H,T,1)
    scores_i = jnp.einsum("bhqd,bhsd->bhqs", q8, kq,
                          preferred_element_type=jnp.int32)
    scores = scores_i.astype(jnp.float32)
    scores = scores * qs.astype(jnp.float32)                   # (B,H,T,S)
    scores = scores * jnp.swapaxes(ks, -1, -2).astype(jnp.float32)
    scores = scores * scale
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)                    # (B,H,T,S)

    pv = probs * jnp.swapaxes(vs, -1, -2).astype(jnp.float32)  # fold v scales
    p8, ps = _quantize_kv(pv)                                  # int8, (B,H,T,1)
    attn_i = jnp.einsum("bhqs,bhsd->bhqd", p8, vq,
                        preferred_element_type=jnp.int32)
    attn = attn_i.astype(jnp.float32) * ps.astype(jnp.float32)
    attn = attn.astype(q.dtype)
    return jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, t, h * d)


def _decode_attn_int8T(q, entry, mask, n_rep: int):
    """Fused int8 decode attention over the SEQ-MINOR cache (kT (B,KH,D,S),
    scales (B,KH,S)); same math as _decode_attn_int8 (see its docstring),
    but q·K^T is now a true (1,D)x(D,S) matmul — contraction over K's
    sublane dim — and the s8 stream carries no lane padding."""
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    kq, ks = entry["kT"], entry["kT_scale"]
    vq, vs = entry["vT"], entry["vT_scale"]
    if n_rep > 1:
        kq = jnp.repeat(kq, n_rep, axis=1)
        ks = jnp.repeat(ks, n_rep, axis=1)
        vq = jnp.repeat(vq, n_rep, axis=1)
        vs = jnp.repeat(vs, n_rep, axis=1)

    qh = jnp.transpose(q, (0, 2, 1, 3))                        # (B,H,T,D)
    q8, qs = _quantize_kv(qh)                                  # int8, (B,H,T,1)
    scores = jnp.einsum("bhqd,bhds->bhqs", q8, kq,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
    scores = scores * qs.astype(jnp.float32)
    scores = scores * ks[:, :, None, :].astype(jnp.float32) * scale
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)                    # (B,H,T,S)

    pv = probs * vs[:, :, None, :].astype(jnp.float32)         # fold v scales
    p8, ps = _quantize_kv(pv)                                  # int8, (B,H,T,1)
    attn_i = jnp.einsum("bhqs,bhds->bhqd", p8, vq,
                        preferred_element_type=jnp.int32)
    attn = attn_i.astype(jnp.float32) * ps.astype(jnp.float32)
    attn = attn.astype(q.dtype)
    return jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, t, h * d)


def _decode_attn_int4T(q, entry, mask, n_rep: int):
    """Fused int4 decode attention over the seq-minor s4 cache
    (kT4 (B,KH,D,S) + per-group scales (B,KH,G,S); vT4 + per-token scales).

    Same structure as _decode_attn_int8T — quantize the tiny side of each
    dot, keep the big side sub-byte so the HBM stream is the packed s4
    bytes. q·K^T runs as G grouped s8 x s4 dots (one per scale group) so the
    per-group K scales factor out of the integer accumulation exactly:
      scores = sum_g qs_g * ks_g * dot_int(q8_g, K4_g).
    The V dot folds the per-token V scales into the prob rows first, exactly
    like int8.
    """
    b, t, h, d = q.shape
    g = d // KV_INT4_GROUP
    scale = 1.0 / (d ** 0.5)
    kq, ks = entry["kT4"], entry["kT4_scale"]          # (B,KH,D,S),(B,KH,G,S)
    vq, vs = entry["vT4"], entry["vT4_scale"]          # (B,KH,D,S),(B,KH,S)
    if n_rep > 1:
        kq = jnp.repeat(kq, n_rep, axis=1)
        ks = jnp.repeat(ks, n_rep, axis=1)
        vq = jnp.repeat(vq, n_rep, axis=1)
        vs = jnp.repeat(vs, n_rep, axis=1)
    s = kq.shape[-1]

    qh = jnp.transpose(q, (0, 2, 1, 3))                # (B,H,T,D)
    # per-group int8 q so each group's (q scale * k scale) is a scalar factor
    q8, qs = _quantize_kv(qh.reshape(b, h, t, g, KV_INT4_GROUP))
    # (B,H,T,G,c) s8  x  (B,H,G,c,S) s4  ->  (B,H,G,T,S) s32
    k4 = kq.reshape(b, h, g, KV_INT4_GROUP, s)
    si = jnp.einsum("bhtgc,bhgcs->bhgts", q8, k4,
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    si = si * jnp.moveaxis(qs[..., 0], 3, 2)[..., None]      # (B,H,G,T,1)
    si = si * ks[:, :, :, None, :].astype(jnp.float32)       # (B,H,G,1,S)
    scores = si.sum(axis=2) * scale                          # (B,H,T,S)
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)

    pv = probs * vs[:, :, None, :].astype(jnp.float32)       # fold v scales
    p8, ps = _quantize_kv(pv)                                # s8, (B,H,T,1)
    attn_i = jnp.einsum("bhqs,bhds->bhqd", p8, vq,
                        preferred_element_type=jnp.int32)
    attn = attn_i.astype(jnp.float32) * ps.astype(jnp.float32)
    attn = attn.astype(q.dtype)
    return jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, t, h * d)


def prefill_forward(params: Params, cfg: GPTConfig, cond_emb: jnp.ndarray,
                    cache, prefill_mask: Optional[jnp.ndarray],
                    freqs_cis: jnp.ndarray):
    """Run the conditioning prefix, filling cache positions [0, T).

    cond_emb: (B, T, dim) already-embedded conditioning.
    prefill_mask: bool (B, 1, T, T) or None (pure causal).
    Returns (last_logits (B, vocab), cache).
    """
    b, t, _ = cond_emb.shape
    freqs = freqs_cis[:t]
    if prefill_mask is None:
        prefill_mask = make_causal_mask(t)[None, None]
    h = cond_emb
    n_rep = cfg.n_head // cfg.kv_heads

    new_cache = []
    for i in range(cfg.n_layer):
        lp = _layer_params(params, i)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv(lp, cfg, hn, freqs)
        k_r = jnp.transpose(k, (0, 2, 1, 3))                  # (B,KH,T,D)
        v_r = jnp.transpose(v, (0, 2, 1, 3))
        entry = _cache_write(cache[i], k_r, v_r, 0, 0)
        attn = _attn_core(q, _repeat_kv(k, n_rep), _repeat_kv(v, n_rep),
                          prefill_mask)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
        new_cache.append(entry)

    h = rms_norm(h[:, -1:], params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)[:, 0]
    return logits, new_cache


def decode_step(params: Params, cfg: GPTConfig, token_emb: jnp.ndarray,
                pos: jnp.ndarray, cache,
                col_valid: Optional[jnp.ndarray],
                freqs_cis: jnp.ndarray,
                window: Optional[int] = None):
    """One cached decode step — the hot loop body (unrolled over layers).

    token_emb: (B, 1, dim); pos: scalar int32 (absolute position);
    col_valid: optional bool (B, S_max) marking valid attention columns
    (padded-text columns removed, ref generate.py:156-165);
    window: static attention read-window — only cache[:, :, :window] is
    streamed (caller guarantees pos < window). Decode is KV-bandwidth-bound,
    so a ramped window is the main throughput lever (see _entry_window).
    Returns (logits (B, vocab), cache).
    """
    b = token_emb.shape[0]
    s_read = min(window, cache_seq_len(cache)) if window is not None \
        else cache_seq_len(cache)
    freqs = jax.lax.dynamic_slice_in_dim(freqs_cis, pos, 1, axis=0)

    col_ids = jnp.arange(s_read)
    causal_cols = col_ids[None, :] <= pos          # (1, S)
    if col_valid is not None:
        cols = causal_cols & col_valid[:, :s_read]  # (B, S)
        mask = cols[:, None, None, :]
    else:
        mask = causal_cols[None, None]             # (1,1,1,S)

    n_rep = cfg.n_head // cfg.kv_heads
    h = token_emb

    new_cache = []
    for i in range(cfg.n_layer):
        lp = _layer_params(params, i)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv(lp, cfg, hn, freqs)
        k_row = jnp.transpose(k, (0, 2, 1, 3))     # (B,KH,1,D)
        v_row = jnp.transpose(v, (0, 2, 1, 3))
        entry = _cache_write(cache[i], k_row, v_row, 0, pos)
        read = _entry_window(entry, window)
        if "km" in entry:
            attn = (_decode_attn_int8_merged(q, read, mask, n_rep)
                    if "km_scale" in entry
                    else _decode_attn_merged(q, read, mask, n_rep))
        elif "kT4" in entry:
            attn = _decode_attn_int4T(q, read, mask, n_rep)
        elif "kT" in entry:
            attn = _decode_attn_int8T(q, read, mask, n_rep)
        elif "k_scale" in entry:
            attn = _decode_attn_int8(q, read, mask, n_rep)
        else:
            attn = _decode_attn(q, read["k"], read["v"], mask, n_rep)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
        new_cache.append(entry)

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)[:, 0]
    return logits, new_cache


def decode_step_multi(params: Params, cfg: GPTConfig, token_emb: jnp.ndarray,
                      pos: jnp.ndarray, cache, active: jnp.ndarray,
                      freqs_cis: jnp.ndarray,
                      col_valid: Optional[jnp.ndarray] = None,
                      read_bound: Optional[int] = None):
    """Continuous-batching decode: PER-SLOT positions (serving hot loop).

    token_emb: (B, 1, dim); pos: (B,) int32 absolute position per slot;
    active: (B,) bool — inactive slots' caches are left untouched and their
    logits are garbage (callers must ignore them). This is the TPU analog of
    vLLM's batched decode over ragged sequences (ref model_runner.py:676-886),
    with a dense slot-indexed cache instead of paged blocks.

    read_bound: static attention read window — writes go to the full cache
    but only cache[:, :, :read_bound] is streamed for the dots (caller
    guarantees every active pos < read_bound). Same bandwidth lever as the
    offline generate ramp (_entry_window); the serving engine buckets it.
    """
    b = token_emb.shape[0]
    s_max = cache_seq_len(cache)
    s_read = min(read_bound, s_max) if read_bound is not None else s_max
    batch_ids = jnp.arange(b)

    # per-slot RoPE rows: (B, 1, pairs, 2)
    freqs_b = freqs_cis[pos][:, None]

    col_ids = jnp.arange(s_read)
    cols = col_ids[None, :] <= pos[:, None]                      # (B, S)
    if col_valid is not None:
        cols = cols & col_valid[:, :s_read]  # padded-text cols masked (t2i)
    mask = cols[:, None, None, :]                                # (B,1,1,S)

    n_rep = cfg.n_head // cfg.kv_heads
    h = token_emb

    def rope_b(x):
        # x: (B, 1, H, D); freqs_b broadcast over heads
        orig = x.dtype
        xs = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        f = freqs_b[:, :, None]                          # (B,1,1,pairs,2)
        cos, sin = f[..., 0], f[..., 1]
        xr, xi = xs[..., 0], xs[..., 1]
        out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
        return out.reshape(x.shape).astype(orig)

    new_cache = []
    for i in range(cfg.n_layer):
        lp = _layer_params(params, i)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        bsz, s, _ = hn.shape
        kv_size = cfg.kv_heads * cfg.head_dim
        qkv = linear(hn, lp["attention"]["wqkv"])
        q, k, v = jnp.split(qkv, [cfg.dim, cfg.dim + kv_size], axis=-1)
        q = rope_b(q.reshape(bsz, s, cfg.n_head, cfg.head_dim))
        k = rope_b(k.reshape(bsz, s, cfg.kv_heads, cfg.head_dim))
        v = v.reshape(bsz, s, cfg.kv_heads, cfg.head_dim)

        # cache rows are (B, KH, S, D): per-slot scatter at [b, :, pos[b], :]
        entry = _cache_write_slots(cache[i], k[:, 0], v[:, 0], batch_ids,
                                   pos, active)
        read = _entry_window(entry, s_read if s_read < s_max else None)
        if "kT4" in entry:
            attn = _decode_attn_int4T(q, read, mask, n_rep)
        elif "kT" in entry:
            attn = _decode_attn_int8T(q, read, mask, n_rep)
        elif "k_scale" in entry:
            attn = _decode_attn_int8(q, read, mask, n_rep)
        else:
            attn = _decode_attn(q, read["k"], read["v"], mask, n_rep)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
        new_cache.append(entry)

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)[:, 0]
    return logits, new_cache


def decode_block_multi(params: Params, cfg: GPTConfig, token_emb: jnp.ndarray,
                       pos0: jnp.ndarray, cache, active: jnp.ndarray,
                       freqs_cis: jnp.ndarray,
                       read_bound: Optional[int] = None):
    """Multi-token cached decode: T tokens per row in ONE forward pass.

    The verify step of speculative decoding (inference/speculative.py) and
    the general "extend by T" primitive. token_emb: (B, T, dim) embeddings of
    tokens whose cache rows land at [pos0[b], pos0[b]+T); attention is
    block-causal (row j sees cache cols <= pos0[b]+j, which includes the
    block's own earlier rows — they are written before the dots). Compared to
    T sequential decode_steps this streams the KV cache and the weights ONCE
    for T positions — on a bandwidth-bound chip that is the entire win of
    speculative decoding. Returns (logits (B, T, vocab), cache); inactive
    rows keep their cache untouched and emit garbage logits.
    """
    b, t, _ = token_emb.shape
    s_max = cache_seq_len(cache)
    s_read = min(read_bound, s_max) if read_bound is not None else s_max
    batch_ids = jnp.arange(b)
    offs = jnp.arange(t)

    # per-row, per-offset RoPE rows: (B, T, pairs, 2)
    freqs_b = freqs_cis[pos0[:, None] + offs[None, :]]

    col_ids = jnp.arange(s_read)
    # (B, T, S): col <= pos0[b] + j
    cols = col_ids[None, None, :] <= (pos0[:, None] + offs[None, :])[..., None]
    mask = cols[:, None]                                        # (B,1,T,S)

    n_rep = cfg.n_head // cfg.kv_heads
    h = token_emb

    def rope_b(x):
        # x: (B, T, H, D); freqs_b broadcast over heads
        orig = x.dtype
        xs = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        f = freqs_b[:, :, None]                          # (B,T,1,pairs,2)
        cos, sin = f[..., 0], f[..., 1]
        xr, xi = xs[..., 0], xs[..., 1]
        out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
        return out.reshape(x.shape).astype(orig)

    new_cache = []
    for i in range(cfg.n_layer):
        lp = _layer_params(params, i)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        kv_size = cfg.kv_heads * cfg.head_dim
        qkv = linear(hn, lp["attention"]["wqkv"])
        q, k, v = jnp.split(qkv, [cfg.dim, cfg.dim + kv_size], axis=-1)
        q = rope_b(q.reshape(b, t, cfg.n_head, cfg.head_dim))
        k = rope_b(k.reshape(b, t, cfg.kv_heads, cfg.head_dim))
        v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)

        entry = cache[i]
        for j in range(t):  # T small (spec window); scatter row by row
            entry = _cache_write_slots(entry, k[:, j], v[:, j], batch_ids,
                                       pos0 + j, active)
        read = _entry_window(entry, s_read if s_read < s_max else None)
        if "kT4" in entry:
            attn = _decode_attn_int4T(q, read, mask, n_rep)
        elif "kT" in entry:
            attn = _decode_attn_int8T(q, read, mask, n_rep)
        elif "k_scale" in entry:
            attn = _decode_attn_int8(q, read, mask, n_rep)
        else:
            attn = _decode_attn(q, read["k"], read["v"], mask, n_rep)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
        new_cache.append(entry)

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)
    return logits, new_cache


def window_sources(cache, pos0: jnp.ndarray,
                   col_valid: Optional[jnp.ndarray] = None,
                   read_bound: Optional[int] = None):
    """Frozen read views + constant mask for a decode window.

    Carrying the slot cache through the window scan with per-row scatters
    defeats XLA's in-place carry aliasing: the compiler inserts
    compressed/uncompressed COPIES of the whole (B,KH,S,D) cache every
    iteration (observed as remat_un/compressed HLO temps — ~10x the
    arithmetic cost at GPT-L batch 64, and an OOM at batch 128). The frozen
    design reads the big cache as a closed-over constant, writes each step's
    K/V into a small (B,KH,k,D) window buffer at a SCALAR index (aliases in
    place, like generate's scan), and commits the window to the big cache
    with ONE scatter per layer afterwards (commit_window).

    Returns ([per-layer read entries sliced to read_bound], big_mask
    (B,1,1,S_read) — columns strictly below each row's window-start pos)."""
    s_max = cache_seq_len(cache)
    s_read = min(read_bound, s_max) if read_bound is not None else s_max
    cols = jnp.arange(s_read)[None, :] < pos0[:, None]           # (B, S)
    if col_valid is not None:
        cols = cols & col_valid[:, :s_read]
    reads = [_entry_window(e, s_read if s_read < s_max else None)
             for e in cache]
    return reads, cols[:, None, None, :]


def init_window_bufs(cfg: GPTConfig, batch: int, k: int, dtype,
                     int8: bool = False):
    """Per-layer window K/V buffers (B, KH, k, D). Over an int8 cache the
    buffers are int8+scales and each token is quantized AT WRITE — exactly
    the per-token path's numerics, so outputs stay invariant to the window
    size the scheduler happens to pick."""
    shape = (batch, cfg.kv_heads, k, cfg.head_dim)
    if int8:
        # cache WRITES stay bit-identical to the per-token path (each token
        # quantized once, at write). The fused attention's prob-row
        # quantization still partitions by source, so int8 sampled streams
        # can flip at near-ties vs a different window size — same class of
        # approximation as int8 KV itself (bf16 streams are exactly
        # window-invariant; test_serve pins both properties).
        sshape = shape[:-1] + (1,)
        return [{"k": jnp.zeros(shape, jnp.int8),
                 "k_scale": jnp.zeros(sshape, jnp.float32),
                 "v": jnp.zeros(shape, jnp.int8),
                 "v_scale": jnp.zeros(sshape, jnp.float32)}
                for _ in range(cfg.n_layer)]
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(cfg.n_layer)]


def _source_scores(qh, q8qs, entry, mask, scale, n_rep: int):
    """Masked pre-softmax scores for one attention source (bf16 or int8;
    the big cache may be seq-minor int8, merged (B*KH,S,D), or seq-major
    window buffers)."""
    if "km" in entry:
        km = entry["km"]
        b, h, t, d = qh.shape
        kh = h // n_rep
        s_len = km.shape[1]
        if "km_scale" in entry:
            q8, qs = q8qs
            q8m = q8.reshape(b * kh, n_rep * t, d)
            qs_m = qs.reshape(b * kh, n_rep * t, 1)
            sm = jnp.einsum("mrd,msd->mrs", q8m, km,
                            preferred_element_type=jnp.int32)
            sm = sm.astype(jnp.float32) * qs_m.astype(jnp.float32)
            sm = sm * entry["km_scale"][:, None, :].astype(jnp.float32) * scale
        else:
            qm = qh.reshape(b * kh, n_rep * t, d)
            sm = jnp.einsum("mrd,msd->mrs", qm, km).astype(jnp.float32) * scale
        s = sm.reshape(b, h, t, s_len)
        return jnp.where(mask, s, -jnp.inf)
    if "kT4" in entry:
        kq, ks = entry["kT4"], entry["kT4_scale"]
        if n_rep > 1:
            kq = jnp.repeat(kq, n_rep, axis=1)
            ks = jnp.repeat(ks, n_rep, axis=1)
        q8, qs = q8qs                                  # (B,H,T,D),(B,H,T,1)
        b, h, t, d = q8.shape
        g = d // KV_INT4_GROUP
        s_len = kq.shape[-1]
        # grouped s8 x s4 dots so the per-group K scales factor out exactly
        si = jnp.einsum("bhtgc,bhgcs->bhgts",
                        q8.reshape(b, h, t, g, KV_INT4_GROUP),
                        kq.reshape(b, h, g, KV_INT4_GROUP, s_len),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
        si = si * ks[:, :, :, None, :].astype(jnp.float32)
        s = si.sum(axis=2) * qs.astype(jnp.float32) * scale
        return jnp.where(mask, s, -jnp.inf)
    if "kT" in entry:
        kq, ks = entry["kT"], entry["kT_scale"]
        if n_rep > 1:
            kq = jnp.repeat(kq, n_rep, axis=1)
            ks = jnp.repeat(ks, n_rep, axis=1)
        q8, qs = q8qs
        s = jnp.einsum("bhqd,bhds->bhqs", q8, kq,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        s = s * qs.astype(jnp.float32) \
            * ks[:, :, None, :].astype(jnp.float32) * scale
        return jnp.where(mask, s, -jnp.inf)
    if "k_scale" in entry:
        kq, ks = entry["k"], entry["k_scale"]
        if n_rep > 1:
            kq = jnp.repeat(kq, n_rep, axis=1)
            ks = jnp.repeat(ks, n_rep, axis=1)
        q8, qs = q8qs
        s = jnp.einsum("bhqd,bhsd->bhqs", q8, kq,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        s = s * qs.astype(jnp.float32) \
            * jnp.swapaxes(ks, -1, -2).astype(jnp.float32) * scale
    else:
        kb = entry["k"]
        if n_rep > 1:
            kb = jnp.repeat(kb, n_rep, axis=1)
        s = jnp.einsum("bhqd,bhsd->bhqs", qh, kb).astype(jnp.float32) * scale
    return jnp.where(mask, s, -jnp.inf)


def _source_attn(probs, entry, n_rep: int):
    """probs (B,H,T,S) x one source's V (bf16 or fused-int8, any layout)."""
    if "vm" in entry:
        vm = entry["vm"]
        b, h, t, s = probs.shape
        kh = h // n_rep
        d = vm.shape[-1]
        pm = probs.reshape(b * kh, n_rep * t, s)
        if "vm_scale" in entry:
            pv = pm * entry["vm_scale"][:, None, :].astype(jnp.float32)
            p8, ps = _quantize_kv(pv)
            am = jnp.einsum("mrs,msd->mrd", p8, vm,
                            preferred_element_type=jnp.int32)
            am = am.astype(jnp.float32) * ps.astype(jnp.float32)
        else:
            am = jnp.einsum("mrs,msd->mrd", pm.astype(vm.dtype),
                            vm).astype(jnp.float32)
        return am.reshape(b, h, t, d)
    if "vT4" in entry:
        vq, vs = entry["vT4"], entry["vT4_scale"]
        if n_rep > 1:
            vq = jnp.repeat(vq, n_rep, axis=1)
            vs = jnp.repeat(vs, n_rep, axis=1)
        pv = probs * vs[:, :, None, :].astype(jnp.float32)
        p8, ps = _quantize_kv(pv)
        a = jnp.einsum("bhqs,bhds->bhqd", p8, vq,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        return a * ps.astype(jnp.float32)
    if "vT" in entry:
        vq, vs = entry["vT"], entry["vT_scale"]
        if n_rep > 1:
            vq = jnp.repeat(vq, n_rep, axis=1)
            vs = jnp.repeat(vs, n_rep, axis=1)
        pv = probs * vs[:, :, None, :].astype(jnp.float32)
        p8, ps = _quantize_kv(pv)
        a = jnp.einsum("bhqs,bhds->bhqd", p8, vq,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        return a * ps.astype(jnp.float32)
    if "v_scale" in entry:
        vq, vs = entry["v"], entry["v_scale"]
        if n_rep > 1:
            vq = jnp.repeat(vq, n_rep, axis=1)
            vs = jnp.repeat(vs, n_rep, axis=1)
        pv = probs * jnp.swapaxes(vs, -1, -2).astype(jnp.float32)
        p8, ps = _quantize_kv(pv)
        a = jnp.einsum("bhqs,bhsd->bhqd", p8, vq,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        return a * ps.astype(jnp.float32)
    vb = entry["v"]
    if n_rep > 1:
        vb = jnp.repeat(vb, n_rep, axis=1)
    return jnp.einsum("bhqs,bhsd->bhqd", probs.astype(vb.dtype),
                      vb).astype(jnp.float32)


def _attn_two_source(q, read, big_mask, win, win_mask, n_rep: int):
    """Decode attention over [frozen big cache | window buffer] with ONE
    softmax across the concatenated scores (mathematically identical to
    attending over the concatenated sequence). Either source may be bf16 or
    fused-int8; with an int8 cache the window buffer is int8 too, so the
    numerics match the per-token write path exactly."""
    b, _, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qh = jnp.transpose(q, (0, 2, 1, 3))                        # (B,H,1,D)
    q8qs = _quantize_kv(qh) if ("k_scale" in read or "kT" in read
                                or "kT4" in read or "km_scale" in read
                                or "k_scale" in win) else None
    sb = _source_scores(qh, q8qs, read, big_mask, scale, n_rep)
    sw = _source_scores(qh, q8qs, win, win_mask, scale, n_rep)
    probs = jax.nn.softmax(jnp.concatenate([sb, sw], axis=-1), axis=-1)
    pb, pw = probs[..., : sb.shape[-1]], probs[..., sb.shape[-1]:]
    attn = (_source_attn(pb, read, n_rep)
            + _source_attn(pw, win, n_rep)).astype(q.dtype)
    return jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, q.shape[1], h * d)


def decode_step_window(params: Params, cfg: GPTConfig, token_emb: jnp.ndarray,
                       i: jnp.ndarray, pos0: jnp.ndarray, reads, big_mask,
                       win_bufs, freqs_cis: jnp.ndarray):
    """One decode step inside a frozen-cache window (see window_sources).

    token_emb (B,1,dim); i scalar iteration index; the fed token sits at
    absolute position pos0 + i per row (all active rows advance in
    lockstep inside a window). Returns (logits (B,V), win_bufs)."""
    k_win = win_bufs[0]["k"].shape[2]
    pos = pos0 + i
    freqs_b = freqs_cis[pos][:, None]
    win_mask = (jnp.arange(k_win) <= i)[None, None, None, :]     # (1,1,1,k)
    n_rep = cfg.n_head // cfg.kv_heads
    h = token_emb

    def rope_b(x):
        orig = x.dtype
        xs = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        f = freqs_b[:, :, None]
        cos, sin = f[..., 0], f[..., 1]
        xr, xi = xs[..., 0], xs[..., 1]
        out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
        return out.reshape(x.shape).astype(orig)

    new_bufs = []
    for li in range(cfg.n_layer):
        lp = _layer_params(params, li)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        bsz, s, _ = hn.shape
        kv_size = cfg.kv_heads * cfg.head_dim
        qkv = linear(hn, lp["attention"]["wqkv"])
        q, k, v = jnp.split(qkv, [cfg.dim, cfg.dim + kv_size], axis=-1)
        q = rope_b(q.reshape(bsz, s, cfg.n_head, cfg.head_dim))
        k = rope_b(k.reshape(bsz, s, cfg.kv_heads, cfg.head_dim))
        v = v.reshape(bsz, s, cfg.kv_heads, cfg.head_dim)

        wb = win_bufs[li]
        k_row = jnp.transpose(k, (0, 2, 1, 3))                  # (B,KH,1,D)
        v_row = jnp.transpose(v, (0, 2, 1, 3))
        if "k_scale" in wb:
            nb = {}
            for name, x in (("k", k_row), ("v", v_row)):
                q8, sc = _quantize_kv(x)
                nb[name] = jax.lax.dynamic_update_slice(
                    wb[name], q8, (0, 0, i, 0))
                nb[name + "_scale"] = jax.lax.dynamic_update_slice(
                    wb[name + "_scale"], sc, (0, 0, i, 0))
        else:
            nb = {"k": jax.lax.dynamic_update_slice(
                      wb["k"], k_row.astype(wb["k"].dtype), (0, 0, i, 0)),
                  "v": jax.lax.dynamic_update_slice(
                      wb["v"], v_row.astype(wb["v"].dtype), (0, 0, i, 0))}
        new_bufs.append(nb)

        attn = _attn_two_source(q, reads[li], big_mask, nb, win_mask, n_rep)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)[:, 0]
    return logits, new_bufs


def decode_block_window(params: Params, cfg: GPTConfig,
                        token_emb: jnp.ndarray, pos0: jnp.ndarray, reads,
                        big_mask, win_bufs, freqs_cis: jnp.ndarray):
    """Block-extend T tokens per row inside a FROZEN-cache window.

    The window analog of decode_block_multi (the speculative verify pass):
    the big cache enters only as read views (window_sources), the block's
    own K/V land in the small window buffers, and the caller commits them
    per layer afterwards (commit_entry). This keeps the spec graph from
    taking AND returning both caches — on the axon AOT path that reserved
    unaliased in+out, ~2x cache HBM (VERDICT r3 weak-item #5).

    token_emb (B, T, dim) at absolute positions [pos0[b], pos0[b]+T);
    attention is block-causal: big cols gated by big_mask (cols < pos0,
    broadcast over T), window col j visible to block row i iff j <= i.
    Returns (logits (B, T, vocab), win_bufs)."""
    b, t, _ = token_emb.shape
    k_win = win_bufs[0]["k"].shape[2]
    freqs_b = freqs_cis[pos0[:, None] + jnp.arange(t)[None, :]]
    win_mask = (jnp.arange(k_win)[None, :]
                <= jnp.arange(t)[:, None])[None, None]          # (1,1,T,k)
    n_rep = cfg.n_head // cfg.kv_heads
    h = token_emb

    def rope_b(x):
        orig = x.dtype
        xs = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        f = freqs_b[:, :, None]                          # (B,T,1,pairs,2)
        cos, sin = f[..., 0], f[..., 1]
        xr, xi = xs[..., 0], xs[..., 1]
        out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
        return out.reshape(x.shape).astype(orig)

    new_bufs = []
    for li in range(cfg.n_layer):
        lp = _layer_params(params, li)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        kv_size = cfg.kv_heads * cfg.head_dim
        qkv = linear(hn, lp["attention"]["wqkv"])
        q, k, v = jnp.split(qkv, [cfg.dim, cfg.dim + kv_size], axis=-1)
        q = rope_b(q.reshape(b, t, cfg.n_head, cfg.head_dim))
        k = rope_b(k.reshape(b, t, cfg.kv_heads, cfg.head_dim))
        v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)

        wb = win_bufs[li]
        k_rows = jnp.transpose(k, (0, 2, 1, 3))                 # (B,KH,T,D)
        v_rows = jnp.transpose(v, (0, 2, 1, 3))
        if "k_scale" in wb:
            nb = {}
            for name, x in (("k", k_rows), ("v", v_rows)):
                q8, sc = _quantize_kv(x)
                nb[name] = jax.lax.dynamic_update_slice(
                    wb[name], q8, (0, 0, 0, 0))
                nb[name + "_scale"] = jax.lax.dynamic_update_slice(
                    wb[name + "_scale"], sc, (0, 0, 0, 0))
        else:
            nb = {"k": jax.lax.dynamic_update_slice(
                      wb["k"], k_rows.astype(wb["k"].dtype), (0, 0, 0, 0)),
                  "v": jax.lax.dynamic_update_slice(
                      wb["v"], v_rows.astype(wb["v"].dtype), (0, 0, 0, 0))}
        new_bufs.append(nb)

        attn = _attn_two_source(q, reads[li], big_mask, nb, win_mask, n_rep)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)
    return logits, new_bufs


def commit_entry(entry, win_buf, pos0: jnp.ndarray, active: jnp.ndarray):
    """Scatter ONE layer's window buffer into its cache entry at
    [b, :, pos0[b]+j] (inactive rows keep their old values; out-of-range
    overshoot positions are dropped by scatter semantics). Kept per-layer —
    and jitted per-layer by the engine with the entry donated — so the
    compiled graph's live set is one layer's entry, not the whole cache
    (the axon AOT path does not alias donated whole-cache in/outs, which
    OOMed GPT-L batch-128 int8 at 21.4 GB)."""
    b, _, k_win, _ = win_buf["k"].shape
    batch_ids = jnp.arange(b)[:, None]                           # (B,1)
    idx = pos0[:, None] + jnp.arange(k_win)[None, :]             # (B,k)
    gate = active[:, None, None, None]
    e = dict(entry)
    if "km" in entry:
        # merged (B*KH, S, D) cache; window buffers stay (B, KH, k, D) —
        # they are small, so only the BIG buffers need the layout-robust
        # merged shape. Scatter through a free (B, KH, S, D) reshape view
        # (row-major split of the leading dim). int8 windows carry the
        # exact per-token scales the merged cache stores — no requantize.
        _, khn, _, d = win_buf["k"].shape
        int8 = "km_scale" in entry
        for wname, cname in (("k", "km"), ("v", "vm")):
            e4 = e[cname].reshape(b, khn, -1, d)
            val = jnp.transpose(win_buf[wname], (0, 2, 1, 3))    # (B,k,KH,D)
            old = e4[batch_ids, :, idx]                          # (B,k,KH,D)
            val = jnp.where(gate, val.astype(old.dtype), old)
            e[cname] = e4.at[batch_ids, :, idx].set(val).reshape(
                b * khn, -1, d)
            if int8:
                es = e[cname + "_scale"].reshape(b, khn, -1)     # (B,KH,S)
                sval = jnp.transpose(win_buf[wname + "_scale"][..., 0],
                                     (0, 2, 1))                  # (B,k,KH)
                sold = es[batch_ids, :, idx]
                sval = jnp.where(gate[..., 0], sval.astype(sold.dtype), sold)
                e[cname + "_scale"] = es.at[batch_ids, :, idx].set(
                    sval).reshape(b * khn, -1)
        return e
    if "kT4" in entry:
        # window buffers are int8 (quantized at write); the commit
        # re-quantizes to s4 + group scales — the int4 error dominates the
        # int8 round-trip, so this matches the per-token write path within
        # the int4 budget (pinned by tests/test_int4.py)
        kf = win_buf["k"].astype(jnp.float32) \
            * win_buf["k_scale"].astype(jnp.float32)     # (B,KH,k,D)
        vf = win_buf["v"].astype(jnp.float32) \
            * win_buf["v_scale"].astype(jnp.float32)
        kq, ksc = _quantize_kv4(kf)                      # s4, (B,KH,k,G)
        vq, vsc = _quantize_kv4_pertoken(vf)             # s4, (B,KH,k,1)
        sd = e["kT4_scale"].dtype
        for cname, val4, sc in (("kT4", kq, ksc), ("vT4", vq, None)):
            val = jnp.transpose(val4, (0, 2, 1, 3))      # (B,k,KH,D)
            old = e[cname][batch_ids, :, :, idx]
            val = jnp.where(gate, val, old)
            e[cname] = e[cname].at[batch_ids, :, :, idx].set(val)
        sval = jnp.transpose(ksc, (0, 2, 1, 3)).astype(sd)  # (B,k,KH,G)
        sold = e["kT4_scale"][batch_ids, :, :, idx]
        sval = jnp.where(gate, sval, sold)
        e["kT4_scale"] = e["kT4_scale"].at[batch_ids, :, :, idx].set(sval)
        vsval = jnp.transpose(vsc[..., 0], (0, 2, 1)).astype(sd)  # (B,k,KH)
        vsold = e["vT4_scale"][batch_ids, :, idx]
        vsval = jnp.where(gate[..., 0], vsval, vsold)
        e["vT4_scale"] = e["vT4_scale"].at[batch_ids, :, idx].set(vsval)
        return e
    if "kT" in entry:
        # window buffers stay seq-major (B,KH,k,D)+(B,KH,k,1); scatter into
        # the seq-minor cache at [b, :, :, pos0[b]+j] / [b, :, pos0[b]+j]
        for wname, cname in (("k", "kT"), ("v", "vT")):
            val = jnp.transpose(win_buf[wname], (0, 2, 1, 3))    # (B,k,KH,D)
            old = e[cname][batch_ids, :, :, idx]                 # (B,k,KH,D)
            val = jnp.where(gate, val.astype(old.dtype), old)
            e[cname] = e[cname].at[batch_ids, :, :, idx].set(val)
            sval = jnp.transpose(win_buf[wname + "_scale"][..., 0],
                                 (0, 2, 1))                      # (B,k,KH)
            sold = e[cname + "_scale"][batch_ids, :, idx]        # (B,k,KH)
            sval = jnp.where(gate[..., 0], sval.astype(sold.dtype), sold)
            e[cname + "_scale"] = e[cname + "_scale"].at[
                batch_ids, :, idx].set(sval)
        return e
    for name in ("k", "k_scale", "v", "v_scale"):
        if name not in win_buf:
            continue
        # window buffers hold the already-quantized int8 values + scales
        # (quantized at write, matching the per-token path bit for bit);
        # value layout for advanced-index scatter: (B,k,KH,D)
        val = jnp.transpose(win_buf[name], (0, 2, 1, 3))
        old = e[name][batch_ids, :, idx]
        val = jnp.where(gate, val.astype(old.dtype), old)
        e[name] = e[name].at[batch_ids, :, idx].set(val)
    return e


def commit_window(cache, win_bufs, pos0: jnp.ndarray, active: jnp.ndarray):
    """All-layer commit (in-jit callers, e.g. tests); the engine commits
    layer-by-layer through its own jitted commit_entry instead."""
    return [commit_entry(e, wb, pos0, active)
            for e, wb in zip(cache, win_bufs)]


def prefill_into_slot(params: Params, cfg: GPTConfig, cond_emb: jnp.ndarray,
                      slot: jnp.ndarray, cache,
                      freqs_cis: jnp.ndarray,
                      prefill_mask: Optional[jnp.ndarray] = None):
    """Prefill ONE request's conditioning into batch row `slot` of the cache.

    cond_emb: (1, T, dim); prefill_mask: optional bool (1,1,T,T) with the
    padded-text/forced-diagonal surgery (t2i serving). Returns
    (last_logits (1, vocab), cache).
    """
    t = cond_emb.shape[1]
    freqs = freqs_cis[:t]
    mask = prefill_mask if prefill_mask is not None \
        else make_causal_mask(t)[None, None]
    n_rep = cfg.n_head // cfg.kv_heads
    h = cond_emb

    new_cache = []
    for i in range(cfg.n_layer):
        lp = _layer_params(params, i)
        hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _qkv(lp, cfg, hn, freqs)
        k_r = jnp.transpose(k, (0, 2, 1, 3))     # (1,KH,T,D)
        v_r = jnp.transpose(v, (0, 2, 1, 3))
        entry = _cache_write(cache[i], k_r, v_r, slot, 0)
        attn = _attn_core(q, _repeat_kv(k, n_rep), _repeat_kv(v, n_rep), mask)
        h = h + linear(attn, lp["attention"]["wo"])
        h = h + _ffn(lp, rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
        new_cache.append(entry)

    h = rms_norm(h[:, -1:], params["norm"], cfg.norm_eps)
    logits = linear(h, params["output"]).astype(jnp.float32)[:, 0]
    return logits, new_cache
