"""Paged decode attention over the dense slot cache (Pallas production kernel).

Adapter from our per-layer (B, KH, S, D) cache to JAX's in-tree TPU
paged-attention kernel (jax.experimental.pallas.ops.tpu.paged_attention:
double-buffered page DMA, online softmax, optional megacore parallelism) —
the TPU-native replacement for vLLM's PagedAttention CUDA kernels
(ref serve/gpt_model.py:13, worker.py CacheEngine).

The dense cache is viewed as pages of `page_size` positions per sequence with
identity page tables — no copies: just reshapes. Per-slot `lengths` encode
each sequence's causal frontier (the serving engine's per-slot positions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dense_cache_as_pages(cache_k: jnp.ndarray, page_size: int):
    """(B, KH, S, D) -> pages (KH, B*S/ps, ps, D) + page_indices (B, S/ps)."""
    b, kh, s, d = cache_k.shape
    assert s % page_size == 0, (s, page_size)
    n_pages = s // page_size
    pages = (cache_k.transpose(1, 0, 2, 3)
             .reshape(kh, b * n_pages, page_size, d))
    page_indices = (jnp.arange(b)[:, None] * n_pages
                    + jnp.arange(n_pages)[None]).astype(jnp.int32)
    return pages, page_indices


def paged_decode_attention(q: jnp.ndarray, cache_k: jnp.ndarray,
                           cache_v: jnp.ndarray, lengths: jnp.ndarray,
                           page_size: int = 64,
                           pages_per_compute_block: int = 4) -> jnp.ndarray:
    """q (B, 1, H, D) against cache (B, KH, S, D); lengths (B,) = pos+1.

    Returns (B, 1, H*D). S must be a multiple of page_size (pad the cache
    allocation, not the data — lengths bound what's read).

    Constraint (this JAX version's Mosaic lowering): head_dim must be a
    multiple of 128 — i.e. GPT-7B-class heads. The smaller zoo members
    (head_dim 64/100) use models/gpt._decode_attn, which is measured
    BW-efficient (3.6 ms for GPT-L's full cache read) — the kernel's win is
    page sharing across requests, not raw speed.
    """
    if q.shape[-1] % 128 != 0:
        raise ValueError(
            f"paged_attention kernel requires head_dim % 128 == 0, got "
            f"{q.shape[-1]}; use gpt._decode_attn for this model")
    b, _, h, d = q.shape
    # the kernel applies no sm_scale: pre-scale q (validated on-chip,
    # max err 2e-3 vs the exact einsum; unscaled q is wildly wrong)
    qk = (q[:, 0].astype(jnp.float32) / (d ** 0.5)).astype(q.dtype)  # (B,H,D)
    k_pages, page_indices = dense_cache_as_pages(cache_k, page_size)
    v_pages, _ = dense_cache_as_pages(cache_v, page_size)
    n_pages = cache_k.shape[2] // page_size
    # kernel requires pages_per_sequence % pages_per_compute_block == 0
    ppcb = min(pages_per_compute_block, n_pages)
    while n_pages % ppcb != 0:
        ppcb -= 1
    from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention
    out = paged_attention(
        qk, k_pages, v_pages, lengths.astype(jnp.int32), page_indices,
        pages_per_compute_block=ppcb)
    return out.reshape(b, 1, h * d)


def reference_decode_attention(q, cache_k, cache_v, lengths):
    """Exact jnp implementation for testing the adapter."""
    b, _, h, d = q.shape
    kh = cache_k.shape[1]
    n_rep = h // kh
    ck = jnp.repeat(cache_k, n_rep, axis=1)
    cv = jnp.repeat(cache_v, n_rep, axis=1)
    qh = q.transpose(0, 2, 1, 3)                   # (B,H,1,D)
    scores = jnp.einsum("bhqd,bhsd->bhqs", qh, ck).astype(jnp.float32)
    scores = scores / (d ** 0.5)
    mask = jnp.arange(cache_k.shape[2])[None, None, None, :] < \
        lengths[:, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqs,bhsd->bhqd", probs.astype(cv.dtype), cv)
    return out.transpose(0, 2, 1, 3).reshape(b, 1, h * d)
