"""Image GPT: shapes, causality, KV-cache decode consistency, CFG, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import GPTConfig, gpt_config
from video_llamagen_tpu.core.rope import precompute_freqs_2d
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.inference.generate import generate


TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                 block_size=16, cls_token_num=1, model_type="c2i",
                 dtype="float32")

TINY_T2I = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97,
                     caption_dim=32, block_size=16, cls_token_num=5,
                     model_type="t2i", dtype="float32")


def _randomize_head(params, key):
    """The output head is zero-init (parity); tests need non-degenerate logits."""
    p = dict(params)
    p["output"] = jax.random.normal(key, params["output"].shape) * 0.02
    return p


@pytest.fixture(scope="module")
def params_c2i():
    return gpt.init_gpt_params(jax.random.key(0), TINY)


@pytest.fixture(scope="module")
def params_c2i_live():
    return _randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY),
                           jax.random.key(9))


@pytest.fixture(scope="module")
def params_t2i():
    return _randomize_head(gpt.init_gpt_params(jax.random.key(1), TINY_T2I),
                           jax.random.key(10))


def test_param_counts_match_zoo():
    # GPT-B should be ~111M params (reference gpt.py:465 comment)
    cfg = gpt_config("GPT-B", vocab_size=16384, block_size=256, num_classes=1000)
    params = jax.eval_shape(lambda: gpt.init_gpt_params(jax.random.key(0), cfg))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert 105e6 < n < 120e6, n


def test_forward_shapes(params_c2i):
    b = 2
    idx = jnp.zeros((b, TINY.block_size - 1), jnp.int32)
    cond = jnp.zeros((b,), jnp.int32)
    targets = jnp.zeros((b, TINY.block_size), jnp.int32)
    logits, loss = gpt.forward(params_c2i, TINY, idx, cond, targets=targets)
    assert logits.shape == (b, TINY.block_size, TINY.vocab_size)
    assert np.isfinite(float(loss))


def test_forward_zero_head_uniform_loss(params_c2i):
    # zero-init output head -> uniform logits -> loss == log(vocab)
    idx = jnp.zeros((1, TINY.block_size - 1), jnp.int32)
    cond = jnp.zeros((1,), jnp.int32)
    targets = jnp.zeros((1, TINY.block_size), jnp.int32)
    _, loss = gpt.forward(params_c2i, TINY, idx, cond, targets=targets)
    np.testing.assert_allclose(float(loss), np.log(TINY.vocab_size), rtol=1e-5)


def test_causality(params_c2i_live):
    """Changing a future token must not change earlier logits."""
    params = params_c2i_live
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, TINY.vocab_size, (1, TINY.block_size - 1)))
    cond = jnp.asarray([3])
    logits1, _ = gpt.forward(params, TINY, idx, cond)
    idx2 = idx.at[0, 10].set((idx[0, 10] + 1) % TINY.vocab_size)
    logits2, _ = gpt.forward(params, TINY, idx2, cond)
    # token at input position 10 is sequence position 11 (after 1 cls token);
    # logits[:, j] predicts image token j from prefix -> positions <= 10 unchanged
    np.testing.assert_allclose(np.asarray(logits1[:, :11]),
                               np.asarray(logits2[:, :11]), atol=1e-4)
    assert not np.allclose(np.asarray(logits1[:, 11:]), np.asarray(logits2[:, 11:]))


def test_valid_mask_zeroes_samples(params_c2i):
    idx = jnp.zeros((2, TINY.block_size - 1), jnp.int32)
    cond = jnp.zeros((2,), jnp.int32)
    targets = jnp.zeros((2, TINY.block_size), jnp.int32)
    _, loss_all = gpt.forward(params_c2i, TINY, idx, cond, targets=targets,
                              valid=jnp.asarray([1.0, 1.0]))
    _, loss_half = gpt.forward(params_c2i, TINY, idx, cond, targets=targets,
                               valid=jnp.asarray([1.0, 0.0]))
    assert np.isfinite(float(loss_half))
    np.testing.assert_allclose(float(loss_all), float(loss_half), rtol=1e-5)


def _greedy_reference_tokens(params, cfg, cond, n_tokens):
    """Greedy decode via repeated FULL forward (no cache) — golden path.

    gpt.forward truncates logits so logits[:, i] predicts image token i given
    tokens < i; with L tokens fed, next-token logits are logits[:, L].
    """
    tokens = []
    idx = None
    for _ in range(n_tokens):
        logits, _ = gpt.forward(params, cfg, idx, cond)
        nxt = int(np.argmax(np.asarray(logits[0, len(tokens)])))
        tokens.append(nxt)
        idx = jnp.asarray([tokens], jnp.int32)
    return tokens


def test_kv_cache_matches_full_forward(params_c2i_live):
    """Greedy tokens from the cached scan == greedy from full re-forward."""
    cond = jnp.asarray([7])
    n = 8
    seq = generate(params_c2i_live, TINY, cond, jax.random.key(0), n,
                   cfg_scale=1.0, sample_logits=False)
    got = np.asarray(seq)[0].tolist()

    want = _greedy_reference_tokens(params_c2i_live, TINY, cond, n)
    assert got == want, (got, want)


def test_generate_cfg_shapes(params_c2i_live):
    seq = generate(params_c2i_live, TINY, jnp.asarray([1, 2]), jax.random.key(0), 6,
                   cfg_scale=2.0, top_k=5, temperature=1.0)
    assert seq.shape == (2, 6)
    assert (np.asarray(seq) >= 0).all() and (np.asarray(seq) < TINY.vocab_size).all()


def test_generate_t2i_with_emb_masks(params_t2i):
    b, t = 2, TINY_T2I.cls_token_num
    cond = jnp.asarray(np.random.RandomState(0).randn(b, t, TINY_T2I.caption_dim)
                       .astype(np.float32))
    # left-padded: first 2 slots invalid for sample 0
    emb_masks = jnp.asarray([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]], jnp.float32)
    seq = generate(params_t2i, TINY_T2I, cond, jax.random.key(0), 6,
                   emb_masks=emb_masks, cfg_scale=1.5, top_k=0)
    assert seq.shape == (2, 6)


def test_cls_token_rope_is_zeroed():
    freqs = precompute_freqs_2d(4, 16, cls_token_num=3)
    assert np.all(np.asarray(freqs[:3]) == 0.0)
    assert not np.all(np.asarray(freqs[3]) == 0.0)


def test_head_dim_100_decode():
    """GPT-3B's head_dim is 100 (dim 3200 / 32 heads) — the reference needs a
    zero-pad 100->112 monkeypatch for vLLM's PagedAttention
    (gpt_model.py:178-224); our einsum/flash dispatch takes any head_dim.
    Tiny model with the same non-multiple-of-64 head_dim: cached decode must
    match the full forward."""
    from video_llamagen_tpu.core.config import GPTConfig
    from video_llamagen_tpu.inference.generate import generate

    cfg = GPTConfig(dim=200, n_layer=2, n_head=2, vocab_size=64,
                    num_classes=8, block_size=16, cls_token_num=1,
                    model_type="c2i", dtype="float32")
    assert cfg.head_dim == 100
    params = gpt.init_gpt_params(jax.random.key(0), cfg)
    cond = jnp.asarray([3], jnp.int32)
    toks = generate(params, cfg, cond, jax.random.key(1), 16,
                    cfg_scale=1.5, sample_logits=False)
    assert toks.shape == (1, 16)

    # greedy cached decode == greedy re-derivation from the training forward
    seq = np.asarray(toks)[0]
    idx = jnp.asarray(seq[None, :-1])
    logits, _ = gpt.forward(params, cfg, idx, cond)
    # CFG at scale 1.5: mix cond/uncond logits like generate does
    null = jnp.full_like(cond, cfg.num_classes)
    logits_u, _ = gpt.forward(params, cfg, idx, null)
    mixed = logits_u + 1.5 * (logits - logits_u)
    # position t in the forward predicts token t (cls prefix occupies slot 0)
    redecoded = np.asarray(mixed.argmax(-1))[0]
    np.testing.assert_array_equal(redecoded, seq)


def test_generate_chunked_bit_identical(params_c2i_live):
    """Ramped-KV-window decode (n_chunks>1) must match the single scan
    exactly — windows always cover pos, so the masked softmax sees the same
    columns (bf16/int8 cache alike)."""
    cond = jnp.asarray([1, 2])
    outs = {}
    for nc in (1, 3, 4):
        outs[nc] = np.asarray(generate(params_c2i_live, TINY, cond,
                                       jax.random.key(7), TINY.block_size,
                                       cfg_scale=2.0, top_k=20, n_chunks=nc))
    assert np.array_equal(outs[1], outs[3])
    assert np.array_equal(outs[1], outs[4])

    a = np.asarray(generate(params_c2i_live, TINY, cond, jax.random.key(7),
                            TINY.block_size, cfg_scale=2.0, top_k=20,
                            kv_int8=True, n_chunks=1))
    b = np.asarray(generate(params_c2i_live, TINY, cond, jax.random.key(7),
                            TINY.block_size, cfg_scale=2.0, top_k=20,
                            kv_int8=True, n_chunks=4))
    assert np.array_equal(a, b)


def test_generate_chunked_t2i_emb_masks(params_t2i):
    """Chunked decode with the t2i padded-text col_valid mask: the sliced
    col_valid[:, :window] path must preserve masking semantics."""
    b = 2
    cond = jax.random.normal(jax.random.key(3),
                             (b, TINY_T2I.cls_token_num, TINY_T2I.caption_dim))
    emb_masks = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], jnp.int32)
    outs = [np.asarray(generate(params_t2i, TINY_T2I, cond, jax.random.key(5),
                                TINY_T2I.block_size, emb_masks=emb_masks,
                                cfg_scale=1.5, top_k=10, n_chunks=nc))
            for nc in (1, 4)]
    assert np.array_equal(outs[0], outs[1])
