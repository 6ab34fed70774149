"""Fused int8-KV decode-attention kernel (interpret mode) == XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.models.gpt import _quantize_kv
from video_llamagen_tpu.ops.decode_attention import (
    decode_attention_reference, fused_decode_attention)


def _setup(b=2, h=4, s=640, d=64):
    q = jax.random.normal(jax.random.key(0), (b, h, d)) * 0.3
    k = jax.random.normal(jax.random.key(1), (b, h, s, d)) * 0.3
    v = jax.random.normal(jax.random.key(2), (b, h, s, d)) * 0.3
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    return q, kq, ks, vq, vs


@pytest.mark.parametrize("pos", [0, 255, 400, 639])
def test_fused_matches_reference(pos):
    q, kq, ks, vq, vs = _setup()
    ref = decode_attention_reference(q, kq, ks, vq, vs, jnp.int32(pos))
    got = fused_decode_attention(q, kq, ks, vq, vs, jnp.int32(pos),
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_unaligned_seq_pads():
    # S not a multiple of the kernel block: tail padding is masked by pos
    q, kq, ks, vq, vs = _setup(s=321)
    ref = decode_attention_reference(q, kq, ks, vq, vs, jnp.int32(320))
    got = fused_decode_attention(q, kq, ks, vq, vs, jnp.int32(320),
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)
