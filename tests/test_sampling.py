"""Top-k / top-p / CFG sampling op tests (vs brute-force numpy)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_llamagen_tpu.ops import sampling


def test_top_k_keeps_k_largest():
    logits = jnp.asarray(np.random.RandomState(0).randn(3, 50).astype(np.float32))
    out = np.asarray(sampling.top_k_filter(logits, 5))
    for row_in, row_out in zip(np.asarray(logits), out):
        kept = row_out > sampling.NEG_INF / 2
        assert kept.sum() == 5
        assert set(np.where(kept)[0]) == set(np.argsort(row_in)[-5:])


def test_top_k_noop_when_zero():
    logits = jnp.ones((2, 10))
    np.testing.assert_array_equal(np.asarray(sampling.top_k_filter(logits, 0)),
                                  np.asarray(logits))


def test_top_p_keeps_nucleus():
    rs = np.random.RandomState(1)
    logits = rs.randn(4, 30).astype(np.float32) * 3
    out = np.asarray(sampling.top_p_filter(jnp.asarray(logits), 0.9))
    for row_in, row_out in zip(logits, out):
        order = np.argsort(-row_in)
        probs = np.exp(row_in[order] - row_in.max())
        probs /= probs.sum()
        cum = np.cumsum(probs)
        # reference semantics: token kept iff cumulative prob before it <= p
        keep_sorted = np.concatenate([[True], cum[:-1] <= 0.9])
        kept = row_out > sampling.NEG_INF / 2
        np.testing.assert_array_equal(kept[order], keep_sorted)


def test_top_p_always_keeps_argmax():
    logits = jnp.asarray([[10.0, 0.0, -5.0]])
    out = np.asarray(sampling.top_p_filter(logits, 0.01))
    assert out[0, 0] > sampling.NEG_INF / 2
    assert (out[0, 1:] < sampling.NEG_INF / 2).all()


def test_sample_token_greedy():
    logits = jnp.asarray([[0.0, 5.0, 1.0], [2.0, 0.0, -1.0]])
    idx = sampling.sample_token(jax.random.key(0), logits, sample_logits=False)
    np.testing.assert_array_equal(np.asarray(idx), [1, 0])


def test_sample_token_respects_top_k():
    rng = jax.random.key(0)
    logits = jnp.asarray(np.random.RandomState(2).randn(8, 100).astype(np.float32))
    for i in range(10):
        idx = np.asarray(sampling.sample_token(jax.random.fold_in(rng, i), logits,
                                               temperature=2.0, top_k=3))
        top3 = np.argsort(np.asarray(logits), axis=-1)[:, -3:]
        for b in range(8):
            assert idx[b] in top3[b]


def test_cfg_mix():
    cond = np.array([[1.0, 2.0]], dtype=np.float32)
    uncond = np.array([[0.0, 1.0]], dtype=np.float32)
    logits = jnp.concatenate([jnp.asarray(cond), jnp.asarray(uncond)], axis=0)
    out = np.asarray(sampling.cfg_mix(logits, 2.0))
    np.testing.assert_allclose(out, uncond + (cond - uncond) * 2.0)
    # flag off -> plain conditional logits
    out2 = np.asarray(sampling.cfg_mix(logits, 2.0, jnp.asarray(False)))
    np.testing.assert_allclose(out2, cond)


def test_int8_weight_quantization():
    from video_llamagen_tpu.ops.quant import (
        quantize_weight, qlinear, dequantize_weight)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(32, 16).astype(np.float32) * 0.1)
    wq = quantize_weight(w)
    assert wq.q.dtype.name == "int8"
    # dequantized weight close to original
    wd = dequantize_weight(wq, jnp.float32)
    np.testing.assert_allclose(np.asarray(wd), np.asarray(w), atol=2e-3)
    # qlinear close to exact matmul
    x = jnp.asarray(rs.randn(4, 32).astype(np.float32))
    np.testing.assert_allclose(np.asarray(qlinear(x, wq)),
                               np.asarray(x @ w), atol=2e-2)


def test_qmatmul_pallas_matches():
    import jax
    from video_llamagen_tpu.ops.quant import quantize_weight
    from video_llamagen_tpu.ops.qmatmul import qmatmul
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(8, 96).astype(np.float32))
    w = jnp.asarray(rs.randn(96, 130).astype(np.float32) * 0.1)
    wq = quantize_weight(w)
    interpret = jax.default_backend() != "tpu"
    got = np.asarray(qmatmul(x, wq.q, wq.scale, interpret=interpret))
    want = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
