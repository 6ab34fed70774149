"""Post-hoc video refiner AE (ref CausalVideoVAE/.../refiner/modeling_refiner.py).

Encoder/decoder pair over the same causal-3D blocks where each decoder level
fuses the mirrored encoder feature via concatenation (skip fusion,
modeling_refiner.py:199-490's forward(h, h_) pattern). Used to sharpen
CausalVAE reconstructions; trained with the same VAE-GAN losses.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...core.config import CausalVAEConfig
from .model import (causal_conv3d, resnet3d, init_resnet3d, attn3d,
                    init_attn3d, spatial_downsample2x, spatial_upsample2x,
                    time_downsample2x, time_upsample2x, _init_cconv, _init_gn,
                    _gn, _spatial_down_levels, _decoder_time_up_levels)
from ...ops.nn import swish

Params = Dict[str, Any]


def init_refiner_params(rng: jax.Array, cfg: CausalVAEConfig) -> Params:
    ch, mults = cfg.hidden_size, cfg.ch_mult
    n_levels = len(mults)
    r = iter(jax.random.split(rng, 8 + n_levels * (2 * cfg.num_res_blocks + 6)))
    in_mults = (1,) + tuple(mults)
    sd = _spatial_down_levels(cfg)

    enc_levels = []
    p: Params = {"conv_in": _init_cconv(next(r), 3, 3, 3, cfg.in_channels, ch)}
    for i in range(n_levels):
        cin, cout = ch * in_mults[i], ch * mults[i]
        level: Params = {"res": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(init_resnet3d(next(r), cin, cout))
            cin = cout
        if i in sd:
            level["downsample"] = _init_cconv(next(r), 1, 3, 3, cout, cout)
        enc_levels.append(level)
    p["enc_levels"] = enc_levels
    block_in = ch * mults[-1]
    p["mid"] = {"res1": init_resnet3d(next(r), block_in, block_in),
                "attn": init_attn3d(next(r), block_in),
                "res2": init_resnet3d(next(r), block_in, block_in)}

    dec_levels: List[Tuple[int, Params]] = []
    cin = block_in
    for i_level in reversed(range(n_levels)):
        cout = ch * mults[i_level]
        skip_ch = ch * mults[i_level]
        level = {"res": [], "fuse": _init_cconv(next(r), 1, 1, 1,
                                                cin + skip_ch, cin)}
        for _ in range(cfg.num_res_blocks + 1):
            level["res"].append(init_resnet3d(next(r), cin, cout))
            cin = cout
        if i_level != 0:
            level["upsample"] = _init_cconv(next(r), 1, 3, 3, cout, cout)
        dec_levels.append((i_level, level))
    p["dec_levels"] = [lv for _, lv in dec_levels]
    p["norm_out"] = _init_gn(cin)
    p["conv_out"] = _init_cconv(next(r), 3, 3, 3, cin, cfg.out_channels)
    return p


def refine(params: Params, cfg: CausalVAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Refine a decoded video (B, T, H, W, 3) -> residual-corrected video."""
    sd = _spatial_down_levels(cfg)
    h = causal_conv3d(x, params["conv_in"])
    skips = []
    for i, level in enumerate(params["enc_levels"]):
        for rb in level["res"]:
            h = resnet3d(rb, h)
        skips.append(h)
        if i in sd:
            h = spatial_downsample2x(h, level["downsample"])
        if i in cfg.time_downsample_levels:
            h = time_downsample2x(h)

    h = resnet3d(params["mid"]["res1"], h)
    h = attn3d(params["mid"]["attn"], h)
    h = resnet3d(params["mid"]["res2"], h)

    tu = _decoder_time_up_levels(cfg)
    dec_level_ids = tuple(reversed(range(len(cfg.ch_mult))))
    for i_level, level in zip(dec_level_ids, params["dec_levels"]):
        # fuse the mirrored encoder feature when spatio-temporally aligned
        # (alignment depends on where time-downsamples sit; guarded fusion
        # keeps every topology shape-correct)
        skip = skips[i_level]
        if h.shape[1:4] == skip.shape[1:4]:
            h = causal_conv3d(jnp.concatenate([h, skip], axis=-1),
                              level["fuse"])
        for rb in level["res"]:
            h = resnet3d(rb, h)
        if i_level != 0:
            h = spatial_upsample2x(h, level["upsample"])
        if i_level in tu:
            h = time_upsample2x(h)

    out = causal_conv3d(swish(_gn(h, params["norm_out"])), params["conv_out"])
    return x + out  # residual refinement
