"""Attention dispatch: Pallas flash attention on TPU, einsum fallback elsewhere.

Training/prefill full-sequence attention for the AR trunks. On TPU this uses
JAX's production flash-attention kernel (online softmax, never materializes
the (S, S) scores matrix — the reason the reference needs nothing comparable
is that torch SDPA ships fused kernels; this is our equivalent). On CPU (or
when a dense additive-bias mask is easier) it falls back to the exact einsum
path in models/gpt._attn_core.

Also hosts ring attention for the `cp` mesh axis — context parallelism over
the t·h·w video token axis (SURVEY.md §5 long-context plan; the reference has
only dead sequence-parallel vestiges, modules.py:184-218).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _einsum_attention(q, k, v, mask, scale):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.nan_to_num(probs)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def flash_attention_tpu(q, k, v, causal: bool = True,
                        bias: Optional[jnp.ndarray] = None,
                        scale: Optional[float] = None):
    """q/k/v (B, S, H, D) -> (B, S, H, D) via the Pallas TPU kernel."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    # kernel layout is (B, H, S, D)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sm_scale = scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    out = fa.flash_attention(qt, kt, vt, ab=bias, causal=causal,
                             sm_scale=sm_scale)
    return out.transpose(0, 2, 1, 3)


def multi_head_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                         causal: bool = True,
                         use_flash: Optional[bool] = None):
    """Unified entry. q/k/v (B, S, H, D); mask bool (..., S, S) or None.

    With mask=None + causal, the TPU path runs flash attention; a dense mask
    is converted to an additive bias for the kernel. Non-TPU backends use the
    exact einsum path.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    # flash kernel: verified on-chip for head_dim 64 (fwd+bwd, err ~7e-3) and
    # 128. Length-aware dispatch (measured, GPT-B train): at seq 256 XLA's
    # fused einsum wins (154 vs 240 ms/step); at seq 5240 flash wins 3.7x
    # (1574 -> 427 ms/step) by never materializing the (S,S) scores.
    if use_flash and q.shape[1] >= 1024 and q.shape[-1] % 64 == 0:
        s = q.shape[1]
        pad = (-s) % 128  # kernel needs seq % block(128) == 0
        if pad and mask is None and causal:
            # tail padding is sound for pure-causal attention: padded keys sit
            # AFTER every real query (never visible), padded queries' outputs
            # are sliced off below
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            out = flash_attention_tpu(qp, kp, vp, causal=True, scale=scale)
            return out[:, :s]
        if pad == 0:
            bias = None
            if mask is not None:
                bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
                b = q.shape[0]
                bias = jnp.broadcast_to(bias, (b, 1, s, s))
                bias = jnp.broadcast_to(bias, (b, q.shape[2], s, s))
                causal = False  # mask already encodes causality
            return flash_attention_tpu(q, k, v, causal=causal, bias=bias,
                                       scale=scale)
        # unaligned + dense mask: exact einsum fallback below
    if mask is None and causal:
        s = q.shape[1]
        mask = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
    return _einsum_attention(q, k, v, mask, scale)


# ---------------------------------------------------------------------------
# Ring attention (context parallelism over the cp axis)
# ---------------------------------------------------------------------------

def ring_attention(q, k, v, axis_name: str = "cp", causal: bool = True):
    """Causal ring attention for sequence-sharded q/k/v.

    Each device holds a contiguous sequence shard (B, S/N, H, D). KV blocks
    rotate around the ring via ppermute while an online-softmax accumulator
    merges partial results — communication overlaps compute and total bytes
    equal one all-gather. Call inside shard_map with the seq axis sharded on
    `axis_name`.
    """
    n = jax.lax.psum(1, axis_name=axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    scale = 1.0 / (d ** 0.5)

    q_pos = my_idx * s_local + jnp.arange(s_local)          # global positions

    # initial accumulators must be marked as varying over the ring axis or
    # jax's shard_map type checker rejects the scan carry (constant -> varying)
    m = jax.lax.pvary(jnp.full((b, h, s_local, 1), -jnp.inf, jnp.float32),
                      (axis_name,))
    l = jax.lax.pvary(jnp.zeros((b, h, s_local, 1), jnp.float32), (axis_name,))
    o = jax.lax.pvary(jnp.zeros((b, s_local, h, d), jnp.float32), (axis_name,))

    def step(carry, step_i):
        m, l, o, k_blk, v_blk = carry
        src = (my_idx - step_i) % n
        kv_pos = src * s_local + jnp.arange(s_local)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk).astype(jnp.float32)
        scores = scores * scale
        if causal:
            allowed = kv_pos[None, :] <= q_pos[:, None]      # (Sq, Sk)
            scores = jnp.where(allowed[None, None], scores, NEG_INF)

        m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l = alpha * l + p.sum(axis=-1, keepdims=True)
        o = (alpha.transpose(0, 2, 1, 3) * o
             + jnp.einsum("bhqk,bkhd->bqhd", p.astype(v_blk.dtype),
                          v_blk).astype(jnp.float32))
        m = m_new

        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m, l, o, k_blk, v_blk), None

    (m, l, o, _, _), _ = jax.lax.scan(step, (m, l, o, k, v), jnp.arange(n))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (o / l_safe.transpose(0, 2, 1, 3)).astype(q.dtype)
