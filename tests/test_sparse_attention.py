"""Fixed-pattern block-sparse attention: pattern correctness and the blocked
(memory-efficient) path == the masked-dense reference, causal and not.
Parity target: tokenizer_video/attention.py:250-340 (DeepSpeed
FixedSparsityConfig)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.ops.sparse_attention import (
    fixed_pattern_mask, sparse_attention, sparse_attention_blocked,
    sparse_attention_masked)


def _qkv(key, s=64, b=2, h=2, d=8):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, s, h, d)) * 0.5
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_pattern_structure():
    m = np.asarray(fixed_pattern_mask(32, 8, 2, 1, causal=False))
    # query in block 2 (rows 16-23): local blocks 1-2, summary = last pos of
    # block 0 (col 7); nothing else
    row = m[20]
    assert row[8:24].all()                 # local window
    assert row[7] and not row[0:7].any()   # summary col only from block 0
    assert not row[24:].any()              # no future blocks (non-causal
                                           # fixed pattern is still banded)


def test_causal_flag_tightens():
    m = np.asarray(fixed_pattern_mask(32, 8, 2, 1, causal=True))
    assert not np.triu(m, k=1).any()
    # diagonal always visible inside the local window
    assert np.diag(m).all()


@pytest.mark.parametrize("causal", [False, True])
def test_blocked_matches_masked(causal):
    q, k, v = _qkv(jax.random.key(0))
    a = sparse_attention_masked(q, k, v, block=16, num_local_blocks=2,
                                num_global=2, causal=causal)
    b = sparse_attention_blocked(q, k, v, block=16, num_local_blocks=2,
                                 num_global=2, causal=causal)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)


def test_blocked_matches_masked_window_longer_than_seq():
    # num_local_blocks > number of blocks: degenerates to (causal) dense
    q, k, v = _qkv(jax.random.key(1), s=32)
    a = sparse_attention_masked(q, k, v, block=8, num_local_blocks=16,
                                num_global=1, causal=True)
    b = sparse_attention_blocked(q, k, v, block=8, num_local_blocks=16,
                                 num_global=1, causal=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)


def test_full_window_equals_dense_causal():
    from video_llamagen_tpu.ops.attention import multi_head_attention
    q, k, v = _qkv(jax.random.key(2), s=32)
    sp = sparse_attention(q, k, v, block=8, num_local_blocks=4, num_global=8,
                          causal=True)
    dense = multi_head_attention(q, k, v, causal=True, use_flash=False)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(dense), atol=1e-5,
                               rtol=1e-5)


def test_jit_and_grad():
    q, k, v = _qkv(jax.random.key(3), s=32)
    f = jax.jit(lambda q, k, v: sparse_attention_blocked(
        q, k, v, block=8, num_local_blocks=2).sum())
    g = jax.grad(f)(q, k, v)
    assert np.all(np.isfinite(np.asarray(g)))
