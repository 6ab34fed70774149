"""Causal 3D video VAE — TPU-native functional rebuild.

Capability parity with reference CausalVideoVAE/causalvideovae/model
(causal_vae/modeling_causalvae.py + modules/): CausalConv3d with
first-frame-replication temporal padding (conv.py:75-131), ResnetBlock3D,
AttnBlock3D (per-frame spatial attention, attention.py:40-76),
SpatialDownsample2x (asymmetric pad + stride-2, updownsample.py:62-90),
TimeDownsample2x (first-frame pad + AvgPool stride 2, updownsample.py:164-180),
SpatialUpsample2x (nearest 2x + conv), TimeUpsample2x (keep frame 0, trilinear
2x on the rest, updownsample.py:182-194), DiagonalGaussian posterior, and
temporal/spatial tiled inference (modeling_causalvae.py:414-570).

Default topology (CausalVAEModel defaults, modeling_causalvae.py:265-320):
ch_mult (1,2,4,4); spatial downsample at levels 0,1,2 (8x); temporal
downsample at levels 1,2 (4x); attention only in the mid block; double_z.

TPU-first: NDHWC layout (XLA-native), pure functions over a params pytree,
static shapes per tile so each tile size compiles once.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.config import CausalVAEConfig
from ...ops.nn import group_norm, swish, init_conv

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive ops (NDHWC; x is (B, T, H, W, C))
# ---------------------------------------------------------------------------

def causal_conv3d(x: jnp.ndarray, p: Params,
                  strides: Tuple[int, int, int] = (1, 1, 1)) -> jnp.ndarray:
    """3D conv that is causal in time: pre-pad by repeating the first frame
    k_t - 1 times, zero temporal conv padding (ref conv.py:125-131).
    Spatial padding is symmetric k//2 (torch padding=k//2 semantics)."""
    kt, kh, kw = p["kernel"].shape[:3]
    if kt > 1:
        first = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([first, x], axis=1)
    pad_h, pad_w = kh // 2, kw // 2
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=strides,
        padding=((0, 0), (pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _init_cconv(rng, kt, kh, kw, cin, cout) -> Params:
    return init_conv(rng, (kt, kh, kw, cin, cout))


def _init_gn(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _gn(x, p):
    return group_norm(x, p["scale"].astype(jnp.float32),
                      p["bias"].astype(jnp.float32))


def spatial_downsample2x(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Pad right/bottom by 1, conv (1,3,3) stride (1,2,2) (ref updownsample.py:62-90)."""
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(1, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["bias"].astype(x.dtype)


def spatial_upsample2x(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Nearest 2x spatial, then causal (1,3,3) conv (ref updownsample.py:124-154)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return causal_conv3d(x, p)


def time_downsample2x(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """First-frame pad + temporal AvgPool(k) stride 2 (ref updownsample.py:164-180)."""
    first = jnp.repeat(x[:, :1], kernel_size - 1, axis=1)
    x = jnp.concatenate([first, x], axis=1)
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, kernel_size, 1, 1, 1),
        window_strides=(1, 2, 1, 1, 1),
        padding="VALID") / kernel_size


def time_upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Keep frame 0; linearly upsample frames 1..T-1 by 2x along time
    (ref updownsample.py:182-194, torch trilinear on the time axis)."""
    if x.shape[1] <= 1:
        return x
    head, rest = x[:, :1], x[:, 1:]
    t = rest.shape[1]
    # torch F.interpolate(scale_factor=2, trilinear, align_corners=False):
    # out[i] sampled at (i + 0.5) / 2 - 0.5 in input coordinates
    pos = (jnp.arange(2 * t) + 0.5) / 2.0 - 0.5
    lo0 = jnp.floor(pos)
    w = (pos - lo0).astype(x.dtype)[None, :, None, None, None]
    lo = jnp.clip(lo0.astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo0.astype(jnp.int32) + 1, 0, t - 1)
    up = rest[:, lo] * (1 - w) + rest[:, hi] * w
    return jnp.concatenate([head, up], axis=1)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def init_resnet3d(rng, cin: int, cout: int) -> Params:
    r = jax.random.split(rng, 3)
    p = {
        "norm1": _init_gn(cin),
        "conv1": _init_cconv(r[0], 3, 3, 3, cin, cout),
        "norm2": _init_gn(cout),
        "conv2": _init_cconv(r[1], 3, 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_cconv(r[2], 1, 1, 1, cin, cout)
    return p


def resnet3d(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = causal_conv3d(swish(_gn(x, p["norm1"])), p["conv1"])
    h = causal_conv3d(swish(_gn(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = causal_conv3d(x, p["nin_shortcut"])
    return x + h


def init_attn3d(rng, c: int) -> Params:
    r = jax.random.split(rng, 4)
    return {
        "norm": _init_gn(c),
        "q": _init_cconv(r[0], 1, 1, 1, c, c),
        "k": _init_cconv(r[1], 1, 1, 1, c, c),
        "v": _init_cconv(r[2], 1, 1, 1, c, c),
        "proj_out": _init_cconv(r[3], 1, 1, 1, c, c),
    }


def attn3d(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact AttnBlock3D (ref attention.py:40-76) — BUG PRESERVED.

    The reference reshapes NCTHW as (b·t, c, h·w), which does NOT slice per
    frame: it scrambles the c and t axes together (its own docstring warns
    "there are issues, use with caution"). Published CausalVAE checkpoints
    were trained through this exact scrambled attention, so weight-import
    parity requires reproducing it bit-for-bit (caught by
    tests/test_import_production.py at the production 512-ch mid block).
    Use attn3d_fixed (= reference AttnBlock3DFix) for clean per-frame
    attention when training from scratch.
    """
    b, t, h, w, c = x.shape
    hn = _gn(x, p["norm"])
    q = causal_conv3d(hn, p["q"])
    k = causal_conv3d(hn, p["k"])
    v = causal_conv3d(hn, p["v"])

    def scramble(u):  # NTHWC -> torch's (b·t, c, h·w) row-major reshape
        return jnp.transpose(u, (0, 4, 1, 2, 3)).reshape(b * t, c, h * w)

    qs = jnp.transpose(scramble(q), (0, 2, 1))                 # (bt, hw, c')
    ks = scramble(k)                                           # (bt, c', hw)
    scores = jnp.einsum("bqc,bck->bqk", qs, ks).astype(jnp.float32)
    scores = scores * (c ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    vs = scramble(v)                                           # (bt, c', hw)
    out = jnp.einsum("bck,bqk->bcq", vs, probs)                # (bt, c', hw)
    out = jnp.transpose(out.reshape(b, c, t, h, w), (0, 2, 3, 4, 1))
    return x + causal_conv3d(out, p["proj_out"])


def attn3d_fixed(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Clean per-frame spatial attention (ref AttnBlock3DFix,
    attention.py:79+): the repaired upstream variant, for from-scratch
    training runs that don't need checkpoint parity with AttnBlock3D."""
    b, t, h, w, c = x.shape
    hn = _gn(x, p["norm"])
    q = causal_conv3d(hn, p["q"]).reshape(b * t, h * w, c)
    k = causal_conv3d(hn, p["k"]).reshape(b * t, h * w, c)
    v = causal_conv3d(hn, p["v"]).reshape(b * t, h * w, c)
    scores = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, t, h, w, c)
    return x + causal_conv3d(out, p["proj_out"])


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def _spatial_down_levels(cfg: CausalVAEConfig) -> Tuple[int, ...]:
    return tuple(range(len(cfg.ch_mult) - 1))   # (0, 1, 2) for 4 levels


def init_encoder(rng, cfg: CausalVAEConfig) -> Params:
    ch, mults = cfg.hidden_size, cfg.ch_mult
    n_levels = len(mults)
    r = iter(jax.random.split(rng, 6 + n_levels * (cfg.num_res_blocks + 2)))
    p: Params = {"conv_in": _init_cconv(next(r), 3, 3, 3, cfg.in_channels, ch)}
    in_mults = (1,) + tuple(mults)
    levels = []
    sd = _spatial_down_levels(cfg)
    for i in range(n_levels):
        cin, cout = ch * in_mults[i], ch * mults[i]
        level: Params = {"res": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(init_resnet3d(next(r), cin, cout))
            cin = cout
        if i in sd:
            level["downsample"] = _init_cconv(next(r), 1, 3, 3, cout, cout)
        # TimeDownsample2x has no params
        levels.append(level)
    block_in = ch * mults[-1]
    p["levels"] = levels
    p["mid"] = {
        "res1": init_resnet3d(next(r), block_in, block_in),
        "attn": init_attn3d(next(r), block_in),
        "res2": init_resnet3d(next(r), block_in, block_in),
    }
    p["norm_out"] = _init_gn(block_in)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["conv_out"] = _init_cconv(next(r), 3, 3, 3, block_in, zc)
    return p


_resnet3d_remat = jax.checkpoint(resnet3d)
_attn3d_remat = jax.checkpoint(attn3d)


def _block_fns(cfg: CausalVAEConfig):
    """cfg.remat: recompute block activations in backward (VQ model has the
    same lever; 3D-conv activations dominate HBM at training shapes)."""
    if cfg.remat:
        return _resnet3d_remat, _attn3d_remat
    return resnet3d, attn3d


def encoder_forward(p: Params, cfg: CausalVAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    rb_f, at_f = _block_fns(cfg)
    h = causal_conv3d(x, p["conv_in"])
    sd = _spatial_down_levels(cfg)
    for i, level in enumerate(p["levels"]):
        for rb in level["res"]:
            h = rb_f(rb, h)
        if i in sd:
            h = spatial_downsample2x(h, level["downsample"])
        if i in cfg.time_downsample_levels:
            h = time_downsample2x(h)
    h = rb_f(p["mid"]["res1"], h)
    h = at_f(p["mid"]["attn"], h)
    h = rb_f(p["mid"]["res2"], h)
    return causal_conv3d(swish(_gn(h, p["norm_out"])), p["conv_out"])


def init_decoder(rng, cfg: CausalVAEConfig) -> Params:
    ch, mults = cfg.hidden_size, cfg.ch_mult
    n_levels = len(mults)
    r = iter(jax.random.split(rng, 6 + n_levels * (cfg.num_res_blocks + 3)))
    block_in = ch * mults[-1]
    p: Params = {"conv_in": _init_cconv(next(r), 3, 3, 3, cfg.z_channels, block_in)}
    p["mid"] = {
        "res1": init_resnet3d(next(r), block_in, block_in),
        "attn": init_attn3d(next(r), block_in),
        "res2": init_resnet3d(next(r), block_in, block_in),
    }
    levels = []
    cin = block_in
    # stored in execution order: deepest level first (reversed i_level)
    for i_level in reversed(range(n_levels)):
        cout = ch * mults[i_level]
        level: Params = {"res": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["res"].append(init_resnet3d(next(r), cin, cout))
            cin = cout
        if i_level != 0:  # decoder_spatial_upsample at levels 1..n-1
            level["upsample"] = _init_cconv(next(r), 1, 3, 3, cout, cout)
        levels.append((i_level, level))
    p["levels"] = [lv for _, lv in levels]
    p["norm_out"] = _init_gn(cin)
    p["conv_out"] = _init_cconv(next(r), 3, 3, 3, cin, cfg.out_channels)
    return p


def _decoder_time_up_levels(cfg: CausalVAEConfig) -> Tuple[int, ...]:
    """decoder_temporal_upsample defaults: levels 2 and 3 (modeling_causalvae.py:317)."""
    n = len(cfg.ch_mult)
    k = len(cfg.time_downsample_levels)
    return tuple(range(n - k, n))


def decoder_forward(p: Params, cfg: CausalVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    rb_f, at_f = _block_fns(cfg)
    h = causal_conv3d(z, p["conv_in"])
    h = rb_f(p["mid"]["res1"], h)
    h = at_f(p["mid"]["attn"], h)
    h = rb_f(p["mid"]["res2"], h)
    tu = _decoder_time_up_levels(cfg)
    level_ids = tuple(reversed(range(len(cfg.ch_mult))))  # execution order
    for i_level, level in zip(level_ids, p["levels"]):
        for rb in level["res"]:
            h = rb_f(rb, h)
        if i_level != 0:
            h = spatial_upsample2x(h, level["upsample"])
        if i_level in tu:
            h = time_upsample2x(h)
    return causal_conv3d(swish(_gn(h, p["norm_out"])), p["conv_out"])


# ---------------------------------------------------------------------------
# Posterior + full model
# ---------------------------------------------------------------------------

class DiagonalGaussian:
    """mean/logvar posterior (ref utils/distrib_utils.py semantics)."""

    def __init__(self, parameters: jnp.ndarray):
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(self.mean ** 2 + jnp.exp(self.logvar)
                             - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


def init_causal_vae_params(rng, cfg: CausalVAEConfig) -> Params:
    r = jax.random.split(rng, 4)
    return {
        "encoder": init_encoder(r[0], cfg),
        "decoder": init_decoder(r[1], cfg),
        "quant_conv": _init_cconv(r[2], 1, 1, 1, 2 * cfg.z_channels,
                                  2 * cfg.embed_dim),
        "post_quant_conv": _init_cconv(r[3], 1, 1, 1, cfg.embed_dim,
                                       cfg.z_channels),
    }


def encode(params: Params, cfg: CausalVAEConfig, x: jnp.ndarray) -> DiagonalGaussian:
    """video (B, T, H, W, 3) -> posterior over (B, t', h', w', embed_dim)."""
    h = encoder_forward(params["encoder"], cfg, x)
    moments = causal_conv3d(h, params["quant_conv"])
    return DiagonalGaussian(moments)


def decode(params: Params, cfg: CausalVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    h = causal_conv3d(z, params["post_quant_conv"])
    return decoder_forward(params["decoder"], cfg, h)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_jit(params: Params, cfg: CausalVAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Compiled direct decode (the eager `decode` dispatches per-primitive —
    hundreds of round-trips over a network-attached chip)."""
    return decode(params, cfg, z)


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_mode_jit(params: Params, cfg: CausalVAEConfig,
                    x: jnp.ndarray) -> jnp.ndarray:
    """Compiled encode returning the posterior mode."""
    return encode(params, cfg, x).mode()


def forward(params: Params, cfg: CausalVAEConfig, x: jnp.ndarray,
            rng: jax.Array, sample_posterior: bool = True):
    posterior = encode(params, cfg, x)
    z = posterior.sample(rng) if sample_posterior else posterior.mode()
    return decode(params, cfg, z), posterior


# ---------------------------------------------------------------------------
# Tiled inference (long/large videos)
# ---------------------------------------------------------------------------

def tiled_encode_temporal(params: Params, cfg: CausalVAEConfig, x: jnp.ndarray,
                          rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Temporal chunking: windows of tile_sample_min_t frames with 1-frame
    overlap whose leading latent frame is dropped after encode
    (ref modeling_causalvae.py:444-489 tiled_encode semantics)."""
    t = x.shape[1]
    win = cfg.tile_sample_min_t
    outs = []
    start = 0
    first = True
    while start < t:
        end = min(start + win, t)
        chunk = x[:, start:end]
        post = encode(params, cfg, chunk)
        z = post.mode() if rng is None else post.sample(
            jax.random.fold_in(rng, start))
        if not first:
            z = z[:, 1:]  # drop the overlapped leading latent frame
        outs.append(z)
        first = False
        start = end - 1 if end < t else end
    return jnp.concatenate(outs, axis=1)


def tiled_decode_temporal(params: Params, cfg: CausalVAEConfig,
                          z: jnp.ndarray) -> jnp.ndarray:
    """Inverse temporal chunking (ref modeling_causalvae.py:491-519)."""
    t = z.shape[1]
    win = (cfg.tile_sample_min_t - 1) // cfg.time_compress + 1
    outs = []
    start = 0
    first = True
    while start < t:
        end = min(start + win, t)
        dec = decode(params, cfg, z[:, start:end])
        if not first:
            dec = dec[:, 1:]
        outs.append(dec)
        first = False
        start = end - 1 if end < t else end
    return jnp.concatenate(outs, axis=1)


def _blend_v(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    w = (jnp.arange(extent) / extent)[None, None, :, None, None]
    return a[:, :, -extent:] * (1 - w) + b[:, :, :extent] * w


def _blend_h(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    w = (jnp.arange(extent) / extent)[None, None, None, :, None]
    return a[:, :, :, -extent:] * (1 - w) + b[:, :, :, :extent] * w


def tiled_encode_spatial(params: Params, cfg: CausalVAEConfig,
                         x: jnp.ndarray,
                         rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Spatial tiling for ENCODE with latent-space seam blending
    (ref modeling_causalvae.py tiled_encode2d)."""
    sf = cfg.spatial_compress
    tile = cfg.tile_sample_min_size
    overlap = int(tile * cfg.tile_overlap_factor)
    stride = tile - overlap
    blend = int((tile // sf) * cfg.tile_overlap_factor)
    row_limit = tile // sf - blend

    rows = []
    for i in range(0, x.shape[2], stride):
        row = []
        for j in range(0, x.shape[3], stride):
            patch = x[:, :, i:i + tile, j:j + tile]
            post = encode(params, cfg, patch)
            z = post.mode() if rng is None else post.sample(
                jax.random.fold_in(rng, i * 131071 + j))
            row.append(z)
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, t in enumerate(row):
            if i > 0:
                blended = _blend_v(rows[i - 1][j], t, blend)
                t = jnp.concatenate([blended, t[:, :, blend:]], axis=2)
            if j > 0:
                blended = _blend_h(result_row[j - 1], t, blend)
                t = jnp.concatenate([blended, t[:, :, :, blend:]], axis=3)
            result_row.append(t)
        result_rows.append(jnp.concatenate(
            [t[:, :, :row_limit, :row_limit] for t in result_row], axis=3))
    return jnp.concatenate(result_rows, axis=2)


def tiled_decode_spatial(params: Params, cfg: CausalVAEConfig,
                         z: jnp.ndarray) -> jnp.ndarray:
    """Spatial tiling with blended seams (ref modeling_causalvae.py:520-570)."""
    sf = cfg.spatial_compress
    tile_latent = cfg.tile_sample_min_size // sf
    overlap = int(tile_latent * cfg.tile_overlap_factor)
    stride = tile_latent - overlap
    blend = int(cfg.tile_sample_min_size * cfg.tile_overlap_factor)
    row_limit = cfg.tile_sample_min_size - blend

    rows = []
    for i in range(0, z.shape[2], stride):
        row = []
        for j in range(0, z.shape[3], stride):
            tile = z[:, :, i:i + tile_latent, j:j + tile_latent]
            row.append(decode(params, cfg, tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                blended = _blend_v(rows[i - 1][j], tile, blend)
                tile = jnp.concatenate([blended, tile[:, :, blend:]], axis=2)
            if j > 0:
                blended = _blend_h(result_row[j - 1], tile, blend)
                tile = jnp.concatenate([blended, tile[:, :, :, blend:]], axis=3)
            result_row.append(tile)
        # every blended tile is trimmed to (row_limit, row_limit) before
        # stitching (ref modeling_causalvae.py:560-566)
        result_rows.append(jnp.concatenate(
            [t[:, :, :row_limit, :row_limit] for t in result_row], axis=3))
    return jnp.concatenate(result_rows, axis=2)


# ---------------------------------------------------------------------------
# Batched tiling (TPU fast path): every tile is full-size, all tiles ride the
# batch dimension through ONE compiled encode/decode call, seams merge by
# weighted overlap-add. The serial functions above keep the reference's exact
# grid/trim arithmetic (ref modeling_causalvae.py:520-570); this path replaces
# their one-dispatch-per-tile Python loop (4+ distinct tile shapes -> 4+ XLA
# compiles and serial execution) with a single static-shape dispatch — the
# difference between ~350 s and seconds for a 17f@256 clip over the tunnel.
# ---------------------------------------------------------------------------

def _cover_positions(extent: int, tile: int, stride: int):
    """Window starts covering [0, extent): multiples of `stride`, with the
    final window shifted back to end exactly at `extent` (all windows full
    size, consecutive overlap >= tile - stride)."""
    if extent <= tile:
        return [0]
    pos = list(range(0, extent - tile, stride))
    pos.append(extent - tile)
    return pos


def _ova_weight(tile: int, ramp: int) -> np.ndarray:
    """1D overlap-add weight: linear ramps of width `ramp` at both ends,
    strictly positive so single-coverage regions normalize to the tile value
    exactly (w cancels in out/wsum)."""
    w = np.ones(tile, np.float32)
    r = (np.arange(1, ramp + 1, dtype=np.float32)) / (ramp + 1)
    w[:ramp] = r
    w[tile - ramp:] = r[::-1]
    return w


def _stack_tiles(x: jnp.ndarray, ys, xs, tile: int) -> jnp.ndarray:
    """(B,T,H,W,C) -> (N*B, T, tile, tile, C), N = len(ys)*len(xs)."""
    tiles = [x[:, :, i:i + tile, j:j + tile] for i in ys for j in xs]
    return jnp.concatenate(tiles, axis=0)


def _merge_tiles(dec: jnp.ndarray, ys, xs, b: int, ramp: int,
                 out_h: int, out_w: int) -> jnp.ndarray:
    """Weighted overlap-add of (N*B, T, th, tw, C) back to
    (B, T, out_h, out_w, C)."""
    th, tw = dec.shape[2], dec.shape[3]
    wh, ww = _ova_weight(th, min(ramp, th // 2)), \
        _ova_weight(tw, min(ramp, tw // 2))
    w2 = jnp.asarray(wh[:, None] * ww[None, :])[None, None, :, :, None]
    out = jnp.zeros((b, dec.shape[1], out_h, out_w, dec.shape[-1]),
                    jnp.float32)
    wsum = jnp.zeros((1, 1, out_h, out_w, 1), jnp.float32)
    n = 0
    for i in ys:
        for j in xs:
            t = dec[n * b:(n + 1) * b].astype(jnp.float32) * w2
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(
                    out, (0, 0, i, j, 0), t.shape) + t, (0, 0, i, j, 0))
            wsum = jax.lax.dynamic_update_slice(
                wsum, jax.lax.dynamic_slice(
                    wsum, (0, 0, i, j, 0), (1, 1, th, tw, 1)) + w2,
                (0, 0, i, j, 0))
            n += 1
    return (out / wsum).astype(dec.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def tiled_decode_spatial_batched(params: Params, cfg: CausalVAEConfig,
                                 z: jnp.ndarray) -> jnp.ndarray:
    """Spatially tiled decode, all tiles in one compiled batch.

    Jitted end to end: the serial reference path dispatches every primitive
    eagerly (hundreds of tunnel round-trips per tile); here tile extraction,
    the decoder, and the overlap-add merge are ONE compiled program."""
    sf = cfg.spatial_compress
    tile_l = cfg.tile_sample_min_size // sf
    overlap_l = max(1, int(tile_l * cfg.tile_overlap_factor))
    h, w = z.shape[2], z.shape[3]
    if h <= tile_l and w <= tile_l:
        return decode(params, cfg, z)             # fits in one tile
    ys = _cover_positions(h, tile_l, tile_l - overlap_l)
    xs = _cover_positions(w, tile_l, tile_l - overlap_l)
    dec = decode(params, cfg, _stack_tiles(z, ys, xs, tile_l))
    ys_p, xs_p = [i * sf for i in ys], [j * sf for j in xs]
    return _merge_tiles(dec, ys_p, xs_p, z.shape[0],
                        overlap_l * sf, h * sf, w * sf)


@functools.partial(jax.jit, static_argnames=("cfg",))
def tiled_encode_spatial_batched(params: Params, cfg: CausalVAEConfig,
                                 x: jnp.ndarray,
                                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Spatially tiled encode, all tiles in one compiled batch; latent-space
    overlap-add on the posterior mode (or a per-tile sample with `rng`)."""
    sf = cfg.spatial_compress
    tile = cfg.tile_sample_min_size
    overlap = max(sf, int(tile * cfg.tile_overlap_factor))
    h, w = x.shape[2], x.shape[3]
    if h <= tile and w <= tile:
        post = encode(params, cfg, x)
        return post.mode() if rng is None else post.sample(rng)
    ys = _cover_positions(h, tile, tile - overlap)
    xs = _cover_positions(w, tile, tile - overlap)
    post = encode(params, cfg, _stack_tiles(x, ys, xs, tile))
    z = post.mode() if rng is None else post.sample(rng)
    ys_l, xs_l = [i // sf for i in ys], [j // sf for j in xs]
    return _merge_tiles(z, ys_l, xs_l, x.shape[0],
                        max(1, overlap // sf), h // sf, w // sf)
