"""Rotary positional embedding tables (1D / 2D image / 3D video).

Behavioral parity with the reference (autoregressive/models/gpt.py:407-437 and
gpt_video.py:507-553), including two deliberate quirks the generated-sample
distribution depends on:

* the first `cls_token_num` rows of the table are ZERO (cos=sin=0), which
  annihilates q/k at conditioning positions rather than leaving them unrotated;
* the 3D "video" table is the 2D grid table tiled `vae_t` times along time with
  NO distinct temporal frequencies (reference gpt_video.py:532-552). A factored
  true-3D variant is provided behind `precompute_freqs_3d_factored` for new
  models.

Tables are stored as (seq, head_dim//2, 2) float32 [cos, sin] pairs; pairs act
on consecutive element pairs (x[2i], x[2i+1]). For the 2D table the first
head_dim//4 frequency pairs encode the row coordinate and the second
head_dim//4 the column coordinate.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _inv_freqs(half_dim: int, base: float) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, half_dim, 2)[: half_dim // 2].astype(np.float64) / half_dim))


def precompute_freqs_1d(seq_len: int, head_dim: int, base: float = 10000.0,
                        cls_token_num: int = 120) -> jnp.ndarray:
    """1D RoPE table with zeroed conditioning prefix (ref gpt.py:407-414)."""
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float64) / head_dim))
    t = np.arange(seq_len, dtype=np.float64)
    angles = np.outer(t, freqs)  # (seq_len, head_dim//2)
    cache = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    cond = np.zeros((cls_token_num, head_dim // 2, 2))
    return jnp.asarray(np.concatenate([cond, cache], axis=0), dtype=jnp.float32)


def _grid_cache_2d(grid_size: int, head_dim: int, base: float) -> np.ndarray:
    """(grid_size**2, head_dim//2, 2) cos/sin cache for a 2D grid (ref gpt.py:417-430)."""
    half_dim = head_dim // 2
    freqs = _inv_freqs(half_dim, base)                      # (head_dim//4,)
    t = np.arange(grid_size, dtype=np.float64)
    f = np.outer(t, freqs)                                  # (g, head_dim//4)
    grid = np.concatenate(
        [
            np.broadcast_to(f[:, None, :], (grid_size, grid_size, f.shape[-1])),
            np.broadcast_to(f[None, :, :], (grid_size, grid_size, f.shape[-1])),
        ],
        axis=-1,
    )                                                       # (g, g, head_dim//2)
    cache = np.stack([np.cos(grid), np.sin(grid)], axis=-1)
    return cache.reshape(grid_size * grid_size, head_dim // 2, 2)


def precompute_freqs_2d(grid_size: int, head_dim: int, base: float = 10000.0,
                        cls_token_num: int = 120) -> jnp.ndarray:
    """2D image RoPE: x/y coordinates each get half the rotary dims."""
    cache = _grid_cache_2d(grid_size, head_dim, base)
    cond = np.zeros((cls_token_num, head_dim // 2, 2))
    return jnp.asarray(np.concatenate([cond, cache], axis=0), dtype=jnp.float32)


def precompute_freqs_3d_video(grid_size: int, vae_t: int, head_dim: int,
                              base: float = 10000.0, cls_token_num: int = 120) -> jnp.ndarray:
    """Reference-parity 3D table: 2D grid tiled vae_t times (gpt_video.py:532-552)."""
    cache = _grid_cache_2d(grid_size, head_dim, base)
    tiled = np.tile(cache[None], (vae_t, 1, 1, 1)).reshape(vae_t * grid_size * grid_size,
                                                           head_dim // 2, 2)
    cond = np.zeros((cls_token_num, head_dim // 2, 2))
    return jnp.asarray(np.concatenate([cond, tiled], axis=0), dtype=jnp.float32)


def precompute_freqs_3d_factored(grid_size: int, vae_t: int, head_dim: int,
                                 base: float = 10000.0, cls_token_num: int = 120,
                                 t_fraction: float = 0.25) -> jnp.ndarray:
    """True factored 3D RoPE (improvement flag; NOT reference behavior).

    A `t_fraction` slice of rotary pairs encodes time; the rest splits evenly
    over x/y. Fixes the reference defect of identical tables for every frame.
    """
    n_pairs = head_dim // 2
    t_pairs = max(1, int(n_pairs * t_fraction))
    s_pairs = n_pairs - t_pairs
    x_pairs = s_pairs // 2
    y_pairs = s_pairs - x_pairs

    def axis_angles(length: int, n: int) -> np.ndarray:
        freqs = 1.0 / (base ** (np.arange(n).astype(np.float64) / max(n, 1)))
        return np.outer(np.arange(length, dtype=np.float64), freqs)

    at = axis_angles(vae_t, t_pairs)          # (T, t_pairs)
    ax = axis_angles(grid_size, x_pairs)      # (G, x_pairs)
    ay = axis_angles(grid_size, y_pairs)      # (G, y_pairs)

    angles = np.concatenate(
        [
            np.broadcast_to(at[:, None, None, :], (vae_t, grid_size, grid_size, t_pairs)),
            np.broadcast_to(ax[None, :, None, :], (vae_t, grid_size, grid_size, x_pairs)),
            np.broadcast_to(ay[None, None, :, :], (vae_t, grid_size, grid_size, y_pairs)),
        ],
        axis=-1,
    ).reshape(vae_t * grid_size * grid_size, n_pairs)
    cache = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    cond = np.zeros((cls_token_num, n_pairs, 2))
    return jnp.asarray(np.concatenate([cond, cache], axis=0), dtype=jnp.float32)


def apply_rotary_emb(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate q/k. x: (..., seq, n_head, head_dim); freqs: (seq, head_dim//2, 2).

    Matches reference apply_rotary_emb (gpt.py:433-444): pairs are consecutive
    elements, rotation computed in float32 then cast back.
    """
    orig_dtype = x.dtype
    xs = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    # broadcast freqs over batch and head axes: (seq, 1, pairs, 2)
    f = freqs.reshape(freqs.shape[0], 1, freqs.shape[1], 2)
    cos, sin = f[..., 0], f[..., 1]
    xr, xi = xs[..., 0], xs[..., 1]
    out = jnp.stack([xr * cos - xi * sin, xi * cos + xr * sin], axis=-1)
    return out.reshape(x.shape).astype(orig_dtype)
