"""All-pairs feature correlation + windowed lookup (RAFT / FloLPIPS cost volume).

TPU-native replacement for the reference's two native implementations:
* CausalVideoVAE/.../eval/RAFT/alt_cuda_corr/correlation.cpp + .cu — CUDA
  all-pairs correlation with radius lookup (backs the warp-error metric);
* eval/flolpips/correlation/correlation.py — inline CuPy string kernels.

Two paths:
* `corr_volume` / `corr_lookup` — pure-XLA: the volume is one batched matmul
  (MXU-native), the lookup a bilinear gather. This is the default.
* `corr_volume_pallas` — tiled Pallas kernel that streams (pix-tile x
  pix-tile) blocks through VMEM, fusing the 1/sqrt(C) scale; useful when the
  full (H*W)^2 volume would blow HBM at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def corr_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) x2 -> correlation volume (B, H, W, H, W), scaled 1/sqrt(C).

    Matches RAFT's CorrBlock.corr (eval/RAFT/core/corr.py semantics).
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, c).astype(jnp.float32)
    vol = jnp.einsum("bpc,bqc->bpq", f1, f2) / jnp.sqrt(jnp.float32(c))
    return vol.reshape(b, h, w, h, w)


TILE = 256


def _corr_kernel(f1_ref, f2_ref, out_ref, *, inv_sqrt_c):
    a = f1_ref[:].astype(jnp.float32)
    bT = f2_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.dot(a, bT.T, preferred_element_type=jnp.float32) * inv_sqrt_c


@functools.partial(jax.jit, static_argnames=("interpret",))
def corr_volume_pallas(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Tiled Pallas correlation for one batch: (H, W, C) x2 -> (H*W, H*W)."""
    h, w, c = fmap1.shape
    p = h * w
    f1 = fmap1.reshape(p, c)
    f2 = fmap2.reshape(p, c)
    pad = (-p) % TILE
    f1p = jnp.pad(f1, ((0, pad), (0, 0)))
    f2p = jnp.pad(f2, ((0, pad), (0, 0)))
    n = f1p.shape[0] // TILE
    inv = 1.0 / float(c) ** 0.5

    out = pl.pallas_call(
        functools.partial(_corr_kernel, inv_sqrt_c=inv),
        out_shape=jax.ShapeDtypeStruct((f1p.shape[0], f2p.shape[0]),
                                       jnp.float32),
        grid=(n, n),
        in_specs=[
            pl.BlockSpec((TILE, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(f1p, f2p)
    return out[:p, :p]


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C), coords (..., 2) as (x, y) float -> (..., C).

    Zero padding outside (matches F.grid_sample(zeros) used by RAFT lookup).
    """
    h, w = img.shape[:2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def tap(xi, yi):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))[..., None]
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return img[yi_c, xi_c] * inb

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def corr_lookup(volume: jnp.ndarray, coords: jnp.ndarray,
                radius: int = 4) -> jnp.ndarray:
    """Sample a (2r+1)^2 window from the volume at flow-displaced coords.

    volume: (B, H, W, H, W); coords: (B, H, W, 2) target positions (x, y).
    Returns (B, H, W, (2r+1)^2) — one RAFT pyramid level's lookup
    (alt_cuda_corr correlation_forward semantics).
    """
    b, h, w = volume.shape[:3]
    ht, wt = volume.shape[3:]        # target dims (pooled at pyramid levels)
    r = radius
    d = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # window channel (i, j) offsets the centroid by (lin[i], lin[j]) — the
    # reference adds a meshgrid(dy, dx) delta to an (x, y) centroid
    # (corr.py:37-42), i.e. its flattened window order is the transpose of
    # the natural (dx, dy) enumeration; the update-block conv weights are
    # trained against that order, so we must reproduce it exactly.
    delta = jnp.stack(jnp.meshgrid(dx, dy, indexing="ij"), axis=-1)  # (d,d,2)

    def one_batch(vol_b, coords_b):
        # vol_b (H, W, Ht, Wt) -> for each source pixel sample target window
        def one_pixel(vol_hw, xy):
            img = vol_hw[..., None]                     # (Ht, Wt, 1)
            pts = xy[None, None, :] + delta             # (d, d, 2)
            return bilinear_sample(img, pts).reshape(d * d)

        flat_vol = vol_b.reshape(h * w, ht, wt)
        flat_xy = coords_b.reshape(h * w, 2)
        return jax.vmap(one_pixel)(flat_vol, flat_xy).reshape(h, w, d * d)

    return jax.vmap(one_batch)(volume, coords)


def corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4):
    """RAFT corr pyramid: volume then 2x average pooling of target dims."""
    b, h, w, c = fmap1.shape
    vol = corr_volume(fmap1, fmap2).reshape(b * h * w, h, w, 1)
    pyramid = [vol]
    for _ in range(num_levels - 1):
        if min(vol.shape[1], vol.shape[2]) < 2:
            pyramid.append(vol)  # too small to pool further (tiny inputs)
            continue
        vol = jax.lax.reduce_window(
            vol, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        pyramid.append(vol)
    return [p.reshape(b, h, w, p.shape[1], p.shape[2]) for p in pyramid]
