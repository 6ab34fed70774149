"""Patch embedding + sincos positional tables (ref autoregressive/models/modules.py).

PatchEmbed2D with 2D-sincos spatial + 1D-sincos temporal absolute positional
embeddings for video/image inputs (modules.py:21-180). The reference file also
contains dead Open-Sora-Plan sequence-parallel code with undefined symbols
(modules.py:181-218) — the live equivalent here is the `cp` mesh axis +
ops/attention.ring_attention.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.nn import init_conv

Params = Dict[str, Any]


def get_1d_sincos_pos_embed(embed_dim: int, length: int,
                            base: float = 10000.0) -> np.ndarray:
    """(length, embed_dim) sin/cos table (ref modules.py get_1d_sincos...)."""
    omega = 1.0 / base ** (np.arange(embed_dim // 2, dtype=np.float64)
                           / (embed_dim / 2.0))
    out = np.outer(np.arange(length, dtype=np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size**2, embed_dim): half the dims encode rows, half columns."""
    half = embed_dim // 2
    emb_h = get_1d_sincos_pos_embed(half, grid_size)      # (g, half)
    emb_w = get_1d_sincos_pos_embed(half, grid_size)
    grid = np.concatenate(
        [np.repeat(emb_h, grid_size, axis=0),
         np.tile(emb_w, (grid_size, 1))], axis=1)
    return grid.astype(np.float32)


def init_patch_embed_params(rng: jax.Array, patch_size: int, in_channels: int,
                            embed_dim: int) -> Params:
    return {"proj": init_conv(rng, (patch_size, patch_size, in_channels,
                                    embed_dim))}


def patch_embed_2d(params: Params, video: jnp.ndarray, patch_size: int,
                   num_frames: Optional[int] = None,
                   use_abs_pos: bool = True) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T*h*w, D) patch tokens with spatial 2D-sincos +
    temporal 1D-sincos absolute embeddings (ref modules.py PatchEmbed2D).
    Images pass as T=1."""
    b, t, h, w, c = video.shape
    flat = video.reshape(b * t, h, w, c)
    x = jax.lax.conv_general_dilated(
        flat, params["proj"]["kernel"].astype(flat.dtype),
        (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["proj"]["bias"].astype(x.dtype)
    hp, wp = x.shape[1], x.shape[2]
    d = x.shape[-1]
    x = x.reshape(b, t, hp * wp, d)
    if use_abs_pos:
        spatial = jnp.asarray(get_2d_sincos_pos_embed(d, hp))[None, None]
        x = x + spatial.astype(x.dtype)
        temporal = jnp.asarray(get_1d_sincos_pos_embed(d, t))[None, :, None]
        x = x + temporal.astype(x.dtype)
    return x.reshape(b, t * hp * wp, d)
