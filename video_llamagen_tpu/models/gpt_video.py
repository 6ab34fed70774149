"""Video AR transformer (t2v) with three prediction heads — TPU-native.

Capability parity with reference autoregressive/models/gpt_video.py (MSE
next-latent head), gpt_video_diff.py (MAR-style per-token DiffLoss head +
MaskGIT iterative sampler) and gpt_video_mask_diff.py (masked training):

* trunk = the same Llama blocks as models/gpt.py, fed CausalVAE latents
  through a `vae_latent_adapter` MLP (vae_embed_dim -> dim) and T5 caption
  features through CaptionEmbedder (ref gpt_video.py:292-297);
* 3D RoPE = 2D grid table tiled vae_t times (parity; a factored table is
  available via core/rope.precompute_freqs_3d_factored);
* heads (cfg.video_head):
    "mse"       — project back with vae_latent_adapter2, MSE to next latent
                  (gpt_video.py:443-447)
    "diff"      — per-token DiffLoss on trunk vectors, diffusion_batch_mul
                  repeat (gpt_video_diff.py:506-516)
    "mask_diff" — truncated-Gaussian mask ratio, masked positions replaced by
                  a learned mask_token, loss on masked positions
                  (gpt_video_mask_diff.py:595-684)

TPU-first differences: static-shape masking (masked positions are replaced in
place — mathematically identical to the reference's gather/restore dance but
with no data-dependent shapes), layer-stacked scan trunk, all losses jit-safe.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GPTConfig
from ..core.rope import precompute_freqs_3d_video
from ..models import gpt
from ..models.diffloss import (
    DiffLossConfig, init_diffloss_params, diffloss_train, diffloss_sample)
from ..ops.nn import gelu_tanh, linear, dropout, init_linear

Params = Dict[str, Any]


def diffloss_config(cfg: GPTConfig) -> DiffLossConfig:
    return DiffLossConfig(
        target_channels=cfg.vae_embed_dim,
        z_channels=cfg.dim,
        depth=cfg.diffloss_d,
        width=cfg.diffloss_w,
        num_sampling_steps=cfg.num_sampling_steps,
    )


def init_video_gpt_params(rng: jax.Array, cfg: GPTConfig) -> Params:
    """Trunk (reuses gpt init) + video adapters + head-specific params."""
    assert cfg.model_type == "t2v"
    r = jax.random.split(rng, 6)
    params = gpt.init_gpt_params(r[0], cfg.replace(model_type="t2i"))
    std = cfg.initializer_range
    ra = jax.random.split(r[1], 4)
    params["vae_latent_adapter"] = {
        "fc1": init_linear(ra[0], cfg.vae_embed_dim, cfg.dim, std),
        "fc2": init_linear(ra[1], cfg.dim, cfg.dim, std),
    }
    if cfg.video_head in ("mse", "mask_mse"):
        params["vae_latent_adapter2"] = {
            "fc1": init_linear(ra[2], cfg.dim, cfg.dim, std),
            "fc2": init_linear(ra[3], cfg.dim, cfg.vae_embed_dim, std),
        }
    if cfg.video_head in ("diff", "mask_diff"):
        params["diffloss"] = init_diffloss_params(r[2], diffloss_config(cfg))
    if cfg.video_head in ("diff", "mask_diff", "mask_mse"):
        params["mask_token"] = jnp.zeros((1, 1, cfg.vae_embed_dim), jnp.float32)
    return params


def _adapter(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """MLP(in -> hidden -> out) with tanh-GELU (ref gpt.py:118-131 MLP)."""
    return linear(gelu_tanh(linear(x, p["fc1"])), p["fc2"])


def video_freqs(cfg: GPTConfig) -> jnp.ndarray:
    return precompute_freqs_3d_video(cfg.grid_size, cfg.vae_t, cfg.head_dim,
                                     cfg.rope_base, cfg.cls_token_num)


def seq_len_video(cfg: GPTConfig) -> int:
    return cfg.grid_size ** 2 * cfg.vae_t


# ---------------------------------------------------------------------------
# Trunk (full-sequence; training and MaskGIT decoding)
# ---------------------------------------------------------------------------

def trunk_forward(params: Params, cfg: GPTConfig,
                  latent_inputs: Optional[jnp.ndarray],
                  cond_embed: Optional[jnp.ndarray],
                  mask: Optional[jnp.ndarray] = None,
                  rng: Optional[jax.Array] = None,
                  train: bool = False,
                  freqs_cis: Optional[jnp.ndarray] = None,
                  cond_embed_precomputed: Optional[jnp.ndarray] = None,
                  pp_ctx=None) -> jnp.ndarray:
    """cond_embed (B, 120, caption_dim) + latents (B, L', vae_dim) -> h (B, T, dim).

    Causal attention by default (parity with reference Attention is_causal).
    `cond_embed_precomputed` (B, T_cond, dim) skips CaptionEmbedder — used by
    the MaskGIT loop, which embeds the caption once outside the iteration.
    `pp_ctx` = (num_stages, num_microbatches, mesh): run the layer stack as a
    GPipe pipeline (parallel/pp.pipeline_layers) instead of the lax.scan —
    identical math, stages sharded over the `pp` mesh axis.
    """
    dtype = jnp.dtype(cfg.dtype)
    rngs = {}
    if rng is not None:
        keys = jax.random.split(rng, 6)
        rngs = dict(zip(["cond", "tok", "resid", "ffn", "drop_path",
                         "drop_path2"], keys))

    if cond_embed_precomputed is not None:
        cond_emb = cond_embed_precomputed.astype(dtype)
    else:
        cond_emb = gpt.embed_caption(params, cfg, cond_embed, rngs.get("cond"),
                                     train, dtype)[:, : cfg.cls_token_num]
    if latent_inputs is not None:
        tok = _adapter(params["vae_latent_adapter"], latent_inputs.astype(dtype))
        h = jnp.concatenate([cond_emb, tok], axis=1)
    else:
        h = cond_emb
    if train:
        h = dropout(rngs.get("tok"), h, cfg.token_dropout_p, not train)

    seq = h.shape[1]
    if freqs_cis is None:
        freqs_cis = video_freqs(cfg)
    freqs = freqs_cis[:seq]
    # mask None -> causal handled inside the attention dispatcher (flash path)

    if pp_ctx is not None:
        from ..parallel.pp import pipeline_layers
        stages, microbatches, mesh = pp_ctx
        h = pipeline_layers(params["layers"], cfg, h, freqs, mask, rngs,
                            train, num_stages=stages,
                            num_microbatches=microbatches, mesh=mesh)
    else:
        dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.n_layer)

        def body(carry, xs):
            layer_params, dp_rate = xs
            return gpt.block_forward(layer_params, cfg, carry, freqs, mask,
                                     rngs or None, train, dp_rate), None

        block_fn = jax.checkpoint(body) if (cfg.remat and train) else body
        h, _ = jax.lax.scan(block_fn, h, (params["layers"], dp_rates))
    from ..ops.nn import rms_norm
    return rms_norm(h, params["norm"], cfg.norm_eps)


# ---------------------------------------------------------------------------
# Training losses (three heads)
# ---------------------------------------------------------------------------

def forward_train_mse(params: Params, cfg: GPTConfig, video_latent: jnp.ndarray,
                      cond_embed: jnp.ndarray, rng: jax.Array,
                      mask: Optional[jnp.ndarray] = None,
                      shuffle_tokens: bool = False, pp_ctx=None):
    """MSE next-latent prediction (ref gpt_video.py:440-447).

    video_latent: (B, L, vae_dim) — full latents; inputs are [:, :-1].
    Returns (pred (B, L, vae_dim), loss).

    shuffle_tokens: the reference's batch-shared random token-order shuffle
    with matching RoPE-table gather (gpt_video.py:374-401), implemented
    correctly: targets and freqs permute together, so the model learns
    any-order generation (the reference's inference-side restore uses an
    undefined ids_restore — here training is self-consistent and inference
    simply uses raster order).
    """
    if shuffle_tokens:
        r_shuf, rng = jax.random.split(rng)
        l = video_latent.shape[1]
        order = jax.random.permutation(r_shuf, l)      # shared across batch
        video_latent = video_latent[:, order]
        freqs = video_freqs(cfg)
        visual = freqs[cfg.cls_token_num:][order]
        freqs_cis = jnp.concatenate([freqs[: cfg.cls_token_num], visual], 0)
    else:
        freqs_cis = None
    inputs = video_latent[:, :-1]
    h = trunk_forward(params, cfg, inputs, cond_embed, mask, rng, train=True,
                      freqs_cis=freqs_cis, pp_ctx=pp_ctx)
    h = _adapter(params["vae_latent_adapter2"], h)
    pred = h[:, cfg.cls_token_num - 1:]
    loss = jnp.mean((pred.astype(jnp.float32)
                     - video_latent.astype(jnp.float32)) ** 2)
    return pred, loss


def forward_train_diff(params: Params, cfg: GPTConfig, video_latent: jnp.ndarray,
                       cond_embed: jnp.ndarray, rng: jax.Array,
                       mask: Optional[jnp.ndarray] = None, pp_ctx=None):
    """Per-token DiffLoss, all positions (ref gpt_video_diff.py:583-658)."""
    r_trunk, r_diff = jax.random.split(rng)
    inputs = video_latent[:, :-1]
    h = trunk_forward(params, cfg, inputs, cond_embed, mask, r_trunk,
                      train=True, pp_ctx=pp_ctx)
    z = h[:, cfg.cls_token_num - 1:]
    token_mask = jnp.ones(video_latent.shape[:2], jnp.float32)
    loss = _diff_loss(params, cfg, z, video_latent, token_mask, r_diff)
    return z, loss


def random_masking(rng: jax.Array, batch: int, length: int,
                   mask_ratio: jnp.ndarray) -> jnp.ndarray:
    """Binary mask (B, L): 1 = masked. Per-sample random subset of size
    L - floor(L*(1-ratio)) (ref gpt_video_mask_diff.py:478-503 semantics,
    static shapes: rank-threshold instead of gather)."""
    noise = jax.random.uniform(rng, (batch, length))
    # rank of each position when sorted ascending by noise
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    len_keep = jnp.floor(length * (1.0 - mask_ratio)).astype(jnp.int32)
    return (ranks >= len_keep).astype(jnp.float32)


def sample_mask_ratio(rng: jax.Array, mask_ratio_min: float) -> jnp.ndarray:
    """Truncated normal centered at 1.0, std 0.25, support [min, 1]
    (ref gpt_video_diff.py:398-404)."""
    a = (mask_ratio_min - 1.0) / 0.25
    return jnp.clip(jax.random.truncated_normal(rng, a, 0.0) * 0.25 + 1.0,
                    mask_ratio_min, 1.0)


def forward_train_mask_diff(params: Params, cfg: GPTConfig,
                            video_latent: jnp.ndarray, cond_embed: jnp.ndarray,
                            rng: jax.Array,
                            mask: Optional[jnp.ndarray] = None, pp_ctx=None):
    """MAR masked training (ref gpt_video_mask_diff.py:595-684): a random
    subset of input latents is replaced by mask_token; DiffLoss only on the
    masked positions."""
    r_ratio, r_mask, r_trunk, r_diff = jax.random.split(rng, 4)
    b, l, _ = video_latent.shape
    ratio = sample_mask_ratio(r_ratio, cfg.mask_ratio_min)
    token_mask = random_masking(r_mask, b, l, ratio)           # (B, L) 1=masked
    mask_tok = params["mask_token"].astype(video_latent.dtype)
    inputs_full = jnp.where(token_mask[..., None] > 0, mask_tok, video_latent)
    inputs = inputs_full[:, :-1]
    h = trunk_forward(params, cfg, inputs, cond_embed, mask, r_trunk,
                      train=True, pp_ctx=pp_ctx)
    z = h[:, cfg.cls_token_num - 1:]
    loss = _diff_loss(params, cfg, z, video_latent, token_mask, r_diff)
    return z, loss


def _diff_loss(params: Params, cfg: GPTConfig, z: jnp.ndarray,
               target: jnp.ndarray, token_mask: jnp.ndarray,
               rng: jax.Array) -> jnp.ndarray:
    """Flatten + diffusion_batch_mul repeat (ref gpt_video_diff.py:506-516)."""
    b, l, _ = target.shape
    mul = cfg.diffusion_batch_mul
    tgt = jnp.tile(target.reshape(b * l, -1), (mul, 1))
    zz = jnp.tile(z.reshape(b * l, -1), (mul, 1))
    mm = jnp.tile(token_mask.reshape(b * l), (mul,))
    return diffloss_train(params["diffloss"], diffloss_config(cfg), tgt, zz,
                          rng, mask=mm)


def forward_train_mask_mse(params: Params, cfg: GPTConfig,
                           video_latent: jnp.ndarray, cond_embed: jnp.ndarray,
                           rng: jax.Array,
                           mask: Optional[jnp.ndarray] = None, pp_ctx=None):
    """Masked MSE training — the intent of the reference's MISSING
    gpt_video_mask.py (train_t2v_mask.py:35 imports it; it doesn't exist
    upstream): mask-token substitution like mask_diff but with the MSE
    projection head, loss on masked positions only."""
    r_ratio, r_mask, r_trunk = jax.random.split(rng, 3)
    b, l, _ = video_latent.shape
    ratio = sample_mask_ratio(r_ratio, cfg.mask_ratio_min)
    token_mask = random_masking(r_mask, b, l, ratio)
    mask_tok = params["mask_token"].astype(video_latent.dtype)
    inputs = jnp.where(token_mask[..., None] > 0, mask_tok, video_latent)[:, :-1]
    h = trunk_forward(params, cfg, inputs, cond_embed, mask, r_trunk,
                      train=True, pp_ctx=pp_ctx)
    h = _adapter(params["vae_latent_adapter2"], h)
    pred = h[:, cfg.cls_token_num - 1:]
    err = (pred.astype(jnp.float32) - video_latent.astype(jnp.float32)) ** 2
    w = token_mask[..., None]
    loss = (err * w).sum() / jnp.maximum(w.sum() * err.shape[-1], 1.0)
    return pred, loss


def forward_train(params: Params, cfg: GPTConfig, video_latent: jnp.ndarray,
                  cond_embed: jnp.ndarray, rng: jax.Array,
                  mask: Optional[jnp.ndarray] = None,
                  shuffle_tokens: bool = False, pp_ctx=None):
    """Dispatch on cfg.video_head — the single training entry point.
    `shuffle_tokens` (mse head only) enables the reference's batch-shared
    random token-order training (gpt_video.py:374-401)."""
    if cfg.video_head == "mse":
        return forward_train_mse(params, cfg, video_latent, cond_embed, rng,
                                 mask, shuffle_tokens=shuffle_tokens,
                                 pp_ctx=pp_ctx)
    if cfg.video_head == "diff":
        return forward_train_diff(params, cfg, video_latent, cond_embed, rng,
                                  mask, pp_ctx=pp_ctx)
    if cfg.video_head == "mask_diff":
        return forward_train_mask_diff(params, cfg, video_latent, cond_embed,
                                       rng, mask, pp_ctx=pp_ctx)
    if cfg.video_head == "mask_mse":
        return forward_train_mask_mse(params, cfg, video_latent, cond_embed,
                                      rng, mask, pp_ctx=pp_ctx)
    raise ValueError(f"unknown video_head {cfg.video_head}")
