"""VQ-VAE image tokenizer — TPU-native functional rebuild.

Capability parity with reference tokenizer/tokenizer_image/vq_model.py:
VQGAN-style conv encoder/decoder (ch=128, configurable ch_mult, 2 res blocks
per level, mid attention), L2-normalized 16384x8 codebook with
straight-through estimator and vq/commit/entropy losses, and the
encode / decode / decode_code API (vq_model.py:41-60).

TPU-first differences:
* NHWC layout everywhere (XLA TPU conv native layout; reference is NCHW);
* nearest-neighbor lookup runs as a fused Pallas kernel (ops/vq_lookup.py)
  instead of materializing the (N, 16384) distance matrix;
* pure functions over a params pytree; codebook-usage tracking is returned as
  data instead of mutating a buffer (vq_model.py:243-247).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.config import VQConfig
from ...ops.nn import group_norm, swish, init_conv
from ...ops.vq_lookup import vq_lookup

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Conv / norm helpers (NHWC)
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, p: Params, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _init_gn(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _gn(x, p):
    return group_norm(x, p["scale"].astype(jnp.float32), p["bias"].astype(jnp.float32))


def _init_conv2d(rng, kh, kw, cin, cout) -> Params:
    return init_conv(rng, (kh, kw, cin, cout))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def init_resnet_block(rng, cin: int, cout: int) -> Params:
    r = jax.random.split(rng, 3)
    p = {
        "norm1": _init_gn(cin),
        "conv1": _init_conv2d(r[0], 3, 3, cin, cout),
        "norm2": _init_gn(cout),
        "conv2": _init_conv2d(r[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv2d(r[2], 1, 1, cin, cout)
    return p


def resnet_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(swish(_gn(x, p["norm1"])), p["conv1"])
    h = conv2d(swish(_gn(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"])
    return x + h


def init_attn_block(rng, c: int) -> Params:
    r = jax.random.split(rng, 4)
    return {
        "norm": _init_gn(c),
        "q": _init_conv2d(r[0], 1, 1, c, c),
        "k": _init_conv2d(r[1], 1, 1, c, c),
        "v": _init_conv2d(r[2], 1, 1, c, c),
        "proj_out": _init_conv2d(r[3], 1, 1, c, c),
    }


def attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head full spatial self-attention (ref vq_model.py:322-356)."""
    b, h, w, c = x.shape
    hn = _gn(x, p["norm"])
    q = conv2d(hn, p["q"]).reshape(b, h * w, c)
    k = conv2d(hn, p["k"]).reshape(b, h * w, c)
    v = conv2d(hn, p["v"]).reshape(b, h * w, c)
    scores = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, h, w, c)
    return x + conv2d(out, p["proj_out"])


def downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric-pad stride-2 conv (ref vq_model.py:381-395: pad right/bottom)."""
    return conv2d(x, p["conv"], stride=2, padding=((0, 1), (0, 1)))


def upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x + conv (ref vq_model.py:365-377)."""
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(x, p["conv"])


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def init_encoder(rng, cfg: VQConfig) -> Params:
    ch, mults = cfg.ch, cfg.encoder_ch_mult
    n_levels = len(mults)
    r = iter(jax.random.split(rng, 4 + n_levels * (cfg.num_res_blocks * 2 + 2)))
    p: Params = {"conv_in": _init_conv2d(next(r), 3, 3, cfg.in_channels, ch)}
    in_mults = (1,) + tuple(mults)
    levels = []
    for i in range(n_levels):
        cin, cout = ch * in_mults[i], ch * mults[i]
        level: Params = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(init_resnet_block(next(r), cin, cout))
            cin = cout
            if i == n_levels - 1:
                level["attn"].append(init_attn_block(next(r), cout))
        if i != n_levels - 1:
            level["downsample"] = {"conv": _init_conv2d(next(r), 3, 3, cout, cout)}
        levels.append(level)
    block_in = ch * mults[-1]
    p["levels"] = levels
    p["mid"] = {
        "res1": init_resnet_block(next(r), block_in, block_in),
        "attn": init_attn_block(next(r), block_in),
        "res2": init_resnet_block(next(r), block_in, block_in),
    }
    p["norm_out"] = _init_gn(block_in)
    p["conv_out"] = _init_conv2d(next(r), 3, 3, block_in, cfg.z_channels)
    return p


_resnet_block_remat = jax.checkpoint(resnet_block)
_attn_block_remat = jax.checkpoint(attn_block)


def _block_fns(cfg: VQConfig):
    """Per-block rematerialization (cfg.remat): recompute activations in the
    backward pass — without it the GAN generator step at batch 32 @256 needs
    24G of HBM (measured on-chip; the chip has 15.75G usable)."""
    if cfg.remat:
        return _resnet_block_remat, _attn_block_remat
    return resnet_block, attn_block


def encoder_forward(p: Params, cfg: VQConfig, x: jnp.ndarray) -> jnp.ndarray:
    rb_f, at_f = _block_fns(cfg)
    h = conv2d(x, p["conv_in"])
    n_levels = len(cfg.encoder_ch_mult)
    for i, level in enumerate(p["levels"]):
        for j, rb in enumerate(level["res"]):
            h = rb_f(rb, h)
            if level["attn"]:
                h = at_f(level["attn"][j], h)
        if i != n_levels - 1:
            h = downsample(level["downsample"], h)
    h = rb_f(p["mid"]["res1"], h)
    h = at_f(p["mid"]["attn"], h)
    h = rb_f(p["mid"]["res2"], h)
    return conv2d(swish(_gn(h, p["norm_out"])), p["conv_out"])


def init_decoder(rng, cfg: VQConfig) -> Params:
    ch, mults = cfg.ch, cfg.decoder_ch_mult
    n_levels = len(mults)
    r = iter(jax.random.split(rng, 6 + n_levels * ((cfg.num_res_blocks + 1) * 2 + 2)))
    block_in = ch * mults[-1]
    p: Params = {"conv_in": _init_conv2d(next(r), 3, 3, cfg.z_channels, block_in)}
    p["mid"] = {
        "res1": init_resnet_block(next(r), block_in, block_in),
        "attn": init_attn_block(next(r), block_in),
        "res2": init_resnet_block(next(r), block_in, block_in),
    }
    levels = []
    cin = block_in
    # levels stored in forward order: highest resolution-index first
    for idx, i_level in enumerate(reversed(range(n_levels))):
        cout = ch * mults[i_level]
        level: Params = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["res"].append(init_resnet_block(next(r), cin, cout))
            cin = cout
            if i_level == n_levels - 1:
                level["attn"].append(init_attn_block(next(r), cout))
        if i_level != 0:
            level["upsample"] = {"conv": _init_conv2d(next(r), 3, 3, cout, cout)}
        levels.append(level)
    p["levels"] = levels
    p["norm_out"] = _init_gn(cin)
    p["conv_out"] = _init_conv2d(next(r), 3, 3, cin, cfg.out_channels)
    return p


def decoder_prehead(p: Params, cfg: VQConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Decoder trunk up to (but excluding) the final conv_out — the "last
    layer" boundary for the GAN's adaptive disc weight (ref vq_loss.py:109-115
    differentiates w.r.t. decoder.last_layer = conv_out.weight)."""
    rb_f, at_f = _block_fns(cfg)
    h = conv2d(z, p["conv_in"])
    h = rb_f(p["mid"]["res1"], h)
    h = at_f(p["mid"]["attn"], h)
    h = rb_f(p["mid"]["res2"], h)
    n_levels = len(cfg.decoder_ch_mult)
    for i, level in enumerate(p["levels"]):
        for j, rb in enumerate(level["res"]):
            h = rb_f(rb, h)
            if level["attn"]:
                h = at_f(level["attn"][j], h)
        if i != n_levels - 1:
            h = upsample(level["upsample"], h)
    return swish(_gn(h, p["norm_out"]))


def decoder_head(conv_out: Params, a: jnp.ndarray) -> jnp.ndarray:
    """Final conv: prehead activation -> pixels."""
    return conv2d(a, conv_out)


def decoder_forward(p: Params, cfg: VQConfig, z: jnp.ndarray) -> jnp.ndarray:
    return decoder_head(p["conv_out"], decoder_prehead(p, cfg, z))


# ---------------------------------------------------------------------------
# Vector quantizer
# ---------------------------------------------------------------------------

def init_quantizer(rng, cfg: VQConfig) -> Params:
    emb = jax.random.uniform(rng, (cfg.codebook_size, cfg.codebook_embed_dim),
                             minval=-1.0 / cfg.codebook_size,
                             maxval=1.0 / cfg.codebook_size)
    if cfg.codebook_l2_norm:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return {"embedding": emb.astype(jnp.float32)}


def _l2n(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def compute_entropy_loss(affinity: jnp.ndarray, temperature: float = 0.01) -> jnp.ndarray:
    """Sample entropy minus average entropy (ref vq_model.py:399-412)."""
    flat = affinity.reshape(-1, affinity.shape[-1]) / temperature
    probs = jax.nn.softmax(flat, axis=-1)
    log_probs = jax.nn.log_softmax(flat + 1e-5, axis=-1)
    avg_probs = jnp.mean(probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
    return sample_entropy - avg_entropy


def quantize(p: Params, cfg: VQConfig, z: jnp.ndarray, train: bool = False):
    """z (B,H,W,e_dim) -> (z_q, (vq_loss, commit_loss, entropy_loss), indices).

    Straight-through estimator preserves encoder gradients
    (ref vq_model.py:216-260).
    """
    zf = z.astype(jnp.float32)
    emb = p["embedding"].astype(jnp.float32)
    if cfg.codebook_l2_norm:
        zf = _l2n(zf)
        emb = _l2n(emb)

    flat = zf.reshape(-1, zf.shape[-1])
    # stop_gradient: the nearest-neighbor index op is non-differentiable (the
    # STE below carries the gradient), and on TPU the Pallas lookup kernel
    # has no VJP — without this, jax.grad over a training step fails with
    # "Linearization failed" (caught on-chip running train_vq)
    indices = vq_lookup(jax.lax.stop_gradient(flat),
                        jax.lax.stop_gradient(emb))
    z_q = emb[indices].reshape(zf.shape)

    vq_loss = commit_loss = entropy_loss = None
    if train:
        vq_loss = jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2)
        commit_loss = cfg.commit_loss_beta * jnp.mean(
            (jax.lax.stop_gradient(z_q) - zf) ** 2)
        if cfg.entropy_loss_ratio > 0:
            d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                 + jnp.sum(emb ** 2, axis=1)[None]
                 - 2.0 * flat @ emb.T)
            entropy_loss = cfg.entropy_loss_ratio * compute_entropy_loss(-d)
        else:
            entropy_loss = jnp.zeros(())

    z_q = zf + jax.lax.stop_gradient(z_q - zf)
    return z_q.astype(z.dtype), (vq_loss, commit_loss, entropy_loss), indices


def codebook_entry(p: Params, cfg: VQConfig, indices: jnp.ndarray,
                   shape: Optional[Tuple[int, ...]] = None) -> jnp.ndarray:
    """Token ids -> (possibly reshaped NHWC) code vectors (ref vq_model.py:262-278)."""
    emb = p["embedding"].astype(jnp.float32)
    if cfg.codebook_l2_norm:
        emb = _l2n(emb)
    z_q = emb[indices.reshape(-1)]
    if shape is not None:
        z_q = z_q.reshape(shape)
    return z_q


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def init_vq_params(rng, cfg: VQConfig) -> Params:
    r = jax.random.split(rng, 5)
    return {
        "encoder": init_encoder(r[0], cfg),
        "decoder": init_decoder(r[1], cfg),
        "quantize": init_quantizer(r[2], cfg),
        "quant_conv": _init_conv2d(r[3], 1, 1, cfg.z_channels, cfg.codebook_embed_dim),
        "post_quant_conv": _init_conv2d(r[4], 1, 1, cfg.codebook_embed_dim,
                                        cfg.z_channels),
    }


def encode(params: Params, cfg: VQConfig, x: jnp.ndarray, train: bool = False):
    """image (B,H,W,3) -> (z_q, losses, indices) (ref vq_model.py:41-46)."""
    h = encoder_forward(params["encoder"], cfg, x)
    h = conv2d(h, params["quant_conv"])
    return quantize(params["quantize"], cfg, h, train)


def decode(params: Params, cfg: VQConfig, z_q: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(z_q, params["post_quant_conv"])
    return decoder_forward(params["decoder"], cfg, h)


def decode_code(params: Params, cfg: VQConfig, codes: jnp.ndarray,
                latent_hw: Tuple[int, int]) -> jnp.ndarray:
    """Token ids (B, h*w) -> images (B, H, W, 3) (ref vq_model.py:52-55)."""
    b = codes.shape[0]
    h, w = latent_hw
    z_q = codebook_entry(params["quantize"], cfg, codes,
                         (b, h, w, cfg.codebook_embed_dim))
    return decode(params, cfg, z_q)


def forward(params: Params, cfg: VQConfig, x: jnp.ndarray, train: bool = False):
    z_q, losses, indices = encode(params, cfg, x, train)
    dec = decode(params, cfg, z_q)
    return dec, losses, indices


def forward_with_prehead(params: Params, cfg: VQConfig, x: jnp.ndarray,
                         train: bool = False):
    """forward() that also returns the decoder prehead activation, for the
    GAN trainer's adaptive disc weight (grads at the last-layer boundary)."""
    z_q, losses, indices = encode(params, cfg, x, train)
    h = conv2d(z_q, params["post_quant_conv"])
    a = decoder_prehead(params["decoder"], cfg, h)
    dec = decoder_head(params["decoder"]["conv_out"], a)
    return dec, losses, indices, a


def encode_indices(params: Params, cfg: VQConfig, x: jnp.ndarray) -> jnp.ndarray:
    """image -> flat token ids (B, h*w) — the GPT-training tokenization path."""
    _, _, indices = encode(params, cfg, x, train=False)
    b = x.shape[0]
    return indices.reshape(b, -1)
