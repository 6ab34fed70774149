"""Fused single-step decode attention over an int8 KV cache (Pallas TPU).

The decode hot loop attends one query row per head against the full cache
(B, H, S, D). The XLA path dequantizes int8 K/V to bf16 and runs two batched
matvecs; this kernel fuses dequant + q·K + masked online softmax + ·V in
VMEM so the only HBM traffic is the int8 cache itself (plus scales).

Position masking: columns s <= pos are valid (decode_step's causal_cols);
col_valid-style per-row masks stay on the XLA path.

MHA only (KH == H — true for every GPT in the zoo); GQA callers keep the
XLA path.

Status: measured and NOT adopted. On-chip at GPT-L decode shapes
(B*H=256, S=640, D=64): XLA batched einsum 713-1010 us; this kernel
1220 us (256-block online softmax) / 1411 us (full-S block). The decode
attention is a batch of tiny matvecs — XLA groups them into a few large
MXU ops while Pallas pays per-program overhead 256x. Same conclusion as
ops/qmatmul.py. The einsum path in models/gpt._decode_attn stays the
production implementation; this file is kept as the measured reference
point (correctness pinned by tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_S = 256
NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref):
    """Grid (B*H, S/BLOCK_S). Per (b,h): online softmax over S blocks.

    q (1, D); k/v (BLOCK_S, D) int8; ks/vs (BLOCK_S, 1) scales.
    """
    sblk = pl.program_id(1)

    @pl.when(sblk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.float32)                       # (1, D)
    k = k_ref[...].astype(jnp.float32) * ks_ref[...].astype(jnp.float32)
    scores = jnp.dot(k, q.T, preferred_element_type=jnp.float32)  # (BS, 1)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = scores * scale

    pos = pos_ref[0]
    col = sblk * BLOCK_S + jax.lax.broadcasted_iota(jnp.int32,
                                                    scores.shape, 0)
    scores = jnp.where(col <= pos, scores, NEG_INF)

    # all accumulator math stays (1, 1)-shaped: Mosaic cannot store scalars
    m_prev = m_ref[...]                                      # (1, 1)
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True).T)
    alpha = jnp.exp(m_prev - m_new)                          # (1, 1)
    p = jnp.exp(scores - m_new[0, 0])                        # (BS, 1)
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=0, keepdims=True).T
    v = v_ref[...].astype(jnp.float32) * vs_ref[...].astype(jnp.float32)
    pv = jnp.dot(p.T, v, preferred_element_type=jnp.float32)  # (1, D)
    acc_ref[...] = alpha * acc_ref[...] + pv
    m_ref[...] = m_new

    @pl.when(sblk == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention(q, k_q, k_s, v_q, v_s, pos,
                           interpret: bool = False):
    """q (B, H, D); k_q/v_q int8 (B, H, S, D); k_s/v_s (B, H, S, 1);
    pos scalar int32. Returns (B, H, D) in q.dtype.
    """
    b, h, d = q.shape
    s = k_q.shape[2]
    pad = (-s) % BLOCK_S
    if pad:
        k_q = jnp.pad(k_q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_q = jnp.pad(v_q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k_s = jnp.pad(k_s, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_s = jnp.pad(v_s, ((0, 0), (0, 0), (0, pad), (0, 0)))
    sp = s + pad

    qf = q.reshape(b * h, 1, d)
    kf = k_q.reshape(b * h, sp, d)
    vf = v_q.reshape(b * h, sp, d)
    ksf = k_s.reshape(b * h, sp, 1)
    vsf = v_s.reshape(b * h, sp, 1)
    posb = jnp.asarray([pos], jnp.int32)

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, sp // BLOCK_S),
            in_specs=[
                pl.BlockSpec((None, 1, d), lambda i, j, pos: (i, 0, 0)),
                pl.BlockSpec((None, BLOCK_S, d), lambda i, j, pos: (i, j, 0)),
                pl.BlockSpec((None, BLOCK_S, 1), lambda i, j, pos: (i, j, 0)),
                pl.BlockSpec((None, BLOCK_S, d), lambda i, j, pos: (i, j, 0)),
                pl.BlockSpec((None, BLOCK_S, 1), lambda i, j, pos: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, 1, d), lambda i, j, pos: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32),
                            pltpu.VMEM((1, 1), jnp.float32),
                            pltpu.VMEM((1, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, 1, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(posb, qf, kf, ksf, vf, vsf)
    return out.reshape(b, h, d)


def decode_attention_reference(q, k_q, k_s, v_q, v_s, pos):
    """XLA reference with identical semantics (dequant + masked softmax)."""
    k = k_q.astype(jnp.float32) * k_s.astype(jnp.float32)
    v = v_q.astype(jnp.float32) * v_s.astype(jnp.float32)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), k) * scale
    s = k.shape[2]
    mask = jnp.arange(s)[None, None, :] <= pos
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", probs, v).astype(q.dtype)
