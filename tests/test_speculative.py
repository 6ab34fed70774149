"""Speculative decoding (inference/speculative.py) + decode_block_multi.

The contract (docstring of spec_generate): the emitted token stream is
distributed exactly as target-only sampling. Greedy (sample_logits=False)
makes that testable bit-for-bit against inference/generate.generate — with a
self-draft (every token accepted), with a mismatched draft (rejection +
fallback path), with CFG, and with top-k/top-p filtering. The stochastic path
is pinned for determinism and self-draft full acceptance.

decode_block_multi is the verify primitive: T cached positions in one pass
must reproduce T sequential decode_step_multi calls on both cache layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.inference.generate import generate, _freqs_for
from video_llamagen_tpu.inference.speculative import spec_generate
from video_llamagen_tpu.models import gpt


def _cfg(**kw):
    base = dict(dim=64, n_layer=2, n_head=4, vocab_size=64, num_classes=8,
                block_size=16, cls_token_num=1, model_type="c2i",
                dtype="float32")
    base.update(kw)
    return GPTConfig(**base)


def _randomize_head(params, key):
    """init_gpt_params zero-inits the output head (reference parity) — all
    fresh models emit uniform logits, which would make every parity test
    here vacuous (greedy = all-token-0). Give the head real weights."""
    params = dict(params)
    params["output"] = jax.random.normal(key, params["output"].shape,
                                         params["output"].dtype) * 0.5
    return params


@pytest.fixture(scope="module")
def models():
    cfg = _cfg()
    dcfg = _cfg(n_layer=1, dim=32, n_head=2)
    params = _randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg),
                             jax.random.key(100))
    draft = _randomize_head(gpt.init_gpt_params(jax.random.key(7), dcfg),
                            jax.random.key(101))
    return cfg, params, dcfg, draft


# ---------------------------------------------------------------- primitive


@pytest.mark.parametrize("kv_int8", [False, True])
def test_decode_block_matches_sequential(models, kv_int8):
    cfg, params, _, _ = models
    b, t, s_max = 3, 4, 12
    freqs = _freqs_for(cfg)
    cond = jnp.array([1, 2, 3])
    emb = gpt.embed_cond(params, cfg, cond, train=False, dtype=jnp.float32)

    def init():
        return (gpt.init_kv_cache_int8(cfg, b, s_max) if kv_int8
                else gpt.init_kv_cache(cfg, b, s_max, jnp.float32))

    _, cache_a = gpt.prefill_forward(params, cfg, emb, init(), None, freqs)
    _, cache_b = gpt.prefill_forward(params, cfg, emb, init(), None, freqs)

    toks = jax.random.randint(jax.random.key(1), (b, t), 0, cfg.vocab_size)
    te = params["tok_embeddings"][toks].astype(jnp.float32)  # (b, t, dim)
    pos0 = jnp.full((b,), cfg.cls_token_num, jnp.int32)
    active = jnp.ones((b,), bool)

    lg_blk, cache_a = jax.jit(gpt.decode_block_multi, static_argnums=(1,))(
        params, cfg, te, pos0, cache_a, active, freqs)

    step = jax.jit(gpt.decode_step_multi, static_argnums=(1,))
    seq_logits = []
    for j in range(t):
        lg, cache_b = step(params, cfg, te[:, j:j + 1], pos0 + j, cache_b,
                           active, freqs)
        seq_logits.append(lg)
    seq = jnp.stack(seq_logits, axis=1)                     # (b, t, vocab)

    tol = 2e-2 if kv_int8 else 1e-4  # int8 re-quantizes q/probs per call
    np.testing.assert_allclose(np.asarray(lg_blk), np.asarray(seq),
                               atol=tol, rtol=tol)
    # caches agree after the block
    for ea, eb in zip(cache_a, cache_b):
        for k in ea:
            np.testing.assert_allclose(np.asarray(ea[k]), np.asarray(eb[k]),
                                       atol=1e-5)


def test_decode_block_inactive_rows_untouched(models):
    cfg, params, _, _ = models
    b, t, s_max = 2, 3, 10
    freqs = _freqs_for(cfg)
    emb = gpt.embed_cond(params, cfg, jnp.array([1, 2]), train=False,
                         dtype=jnp.float32)
    cache = gpt.init_kv_cache(cfg, b, s_max, jnp.float32)
    _, cache = gpt.prefill_forward(params, cfg, emb, cache, None, freqs)
    before = jax.tree_util.tree_map(np.asarray, cache)

    toks = jnp.ones((b, t), jnp.int32)
    te = params["tok_embeddings"][toks].astype(jnp.float32)
    active = jnp.array([True, False])
    _, cache = gpt.decode_block_multi(params, cfg, te,
                                      jnp.full((b,), 1, jnp.int32), cache,
                                      active, freqs)
    after = jax.tree_util.tree_map(np.asarray, cache)
    for eb, ea in zip(before, after):
        for k in eb:
            np.testing.assert_array_equal(eb[k][1], ea[k][1])  # row 1 frozen
            assert not np.array_equal(eb[k][0], ea[k][0])      # row 0 written


# ------------------------------------------------------------ greedy parity


def _greedy_ref(params, cfg, cond, n, **kw):
    return np.asarray(generate(params, cfg, cond, jax.random.key(0), n,
                               sample_logits=False, n_chunks=1, **kw))


def test_spec_greedy_self_draft_bit_equal(models):
    cfg, params, _, _ = models
    cond = jnp.array([0, 3, 5, 7])
    n = 12
    ref = _greedy_ref(params, cfg, cond, n)
    out = np.asarray(spec_generate(params, cfg, params, cfg, cond,
                                   jax.random.key(0), n, spec_k=4,
                                   sample_logits=False))
    np.testing.assert_array_equal(out, ref)


def test_spec_greedy_mismatched_draft_equals_target(models):
    """A wrong draft must still emit the target's greedy stream (rejection +
    fallback correctness), for K not dividing max_new_tokens."""
    cfg, params, dcfg, draft = models
    cond = jnp.array([1, 2])
    n = 11
    ref = _greedy_ref(params, cfg, cond, n)
    for k in (1, 3, 5):
        out = np.asarray(spec_generate(params, cfg, draft, dcfg, cond,
                                       jax.random.key(0), n, spec_k=k,
                                       sample_logits=False))
        np.testing.assert_array_equal(out, ref)


def test_spec_greedy_cfg(models):
    cfg, params, dcfg, draft = models
    cond = jnp.array([4, 6])
    n = 9
    ref = _greedy_ref(params, cfg, cond, n, cfg_scale=2.0)
    out = np.asarray(spec_generate(params, cfg, draft, dcfg, cond,
                                   jax.random.key(0), n, spec_k=3,
                                   cfg_scale=2.0, sample_logits=False))
    np.testing.assert_array_equal(out, ref)


def test_spec_greedy_topk_topp(models):
    cfg, params, dcfg, draft = models
    cond = jnp.array([2])
    n = 8
    ref = _greedy_ref(params, cfg, cond, n, temperature=0.8, top_k=8,
                      top_p=0.9)
    out = np.asarray(spec_generate(params, cfg, draft, dcfg, cond,
                                   jax.random.key(0), n, spec_k=2,
                                   temperature=0.8, top_k=8, top_p=0.9,
                                   sample_logits=False))
    np.testing.assert_array_equal(out, ref)


def test_spec_greedy_int8_kv(models):
    """int8 KV on both models: greedy spec must equal greedy generate with the
    same int8 target cache (same quantized distribution => same argmax)."""
    cfg, params, _, _ = models
    cond = jnp.array([0, 5])
    n = 8
    ref = np.asarray(generate(params, cfg, cond, jax.random.key(0), n,
                              sample_logits=False, kv_int8=True, n_chunks=1))
    out = np.asarray(spec_generate(params, cfg, params, cfg, cond,
                                   jax.random.key(0), n, spec_k=4,
                                   sample_logits=False, kv_int8=True,
                                   draft_kv_int8=True))
    np.testing.assert_array_equal(out, ref)


def test_spec_stats(models):
    """Self-draft greedy accepts every proposal; a mismatched draft can't.
    drafted must be K * blocks, acceptance in [0, 1]."""
    cfg, params, dcfg, draft = models
    cond = jnp.array([0, 3])
    n, k = 12, 3
    _, s = spec_generate(params, cfg, params, cfg, cond, jax.random.key(0),
                         n, spec_k=k, sample_logits=False, return_stats=True)
    assert int(s["drafted"]) == k * int(s["blocks"])
    assert int(s["accepted"]) == int(s["drafted"])  # self-draft: all accepted
    _, s2 = spec_generate(params, cfg, draft, dcfg, cond, jax.random.key(0),
                          n, spec_k=k, sample_logits=False, return_stats=True)
    assert 0 <= int(s2["accepted"]) < int(s2["drafted"])


# ------------------------------------------------------------- stochastic


def test_spec_stochastic_deterministic_and_in_range(models):
    cfg, params, dcfg, draft = models
    cond = jnp.array([1, 3, 5])
    n = 10
    a = np.asarray(spec_generate(params, cfg, draft, dcfg, cond,
                                 jax.random.key(42), n, spec_k=3))
    b = np.asarray(spec_generate(params, cfg, draft, dcfg, cond,
                                 jax.random.key(42), n, spec_k=3))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, n)
    assert a.min() >= 0 and a.max() < cfg.vocab_size
    c = np.asarray(spec_generate(params, cfg, draft, dcfg, cond,
                                 jax.random.key(43), n, spec_k=3))
    assert not np.array_equal(a, c)


def test_spec_stochastic_marginal_matches_target():
    """Distributional check with real power: a 1-layer target whose sampling
    distribution is far from the (differently-initialized) draft's. The
    marginal token histogram of spec output must be close to target-only
    sampling and the draft must be measurably farther (TV distance)."""
    cfg = _cfg(n_layer=1, vocab_size=16)
    params = _randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg),
                             jax.random.key(200))
    draft = _randomize_head(gpt.init_gpt_params(jax.random.key(9), cfg),
                            jax.random.key(201))
    b, n, seeds = 16, 8, 6
    cond = jnp.tile(jnp.arange(8), 2)

    def hist(fn):
        h = np.zeros(cfg.vocab_size)
        for s in range(seeds):
            toks = np.asarray(fn(jax.random.key(100 + s)))
            np.add.at(h, toks.ravel(), 1)
        return h / h.sum()

    # sharpen with low temperature so target/draft marginals separate
    kw = dict(temperature=0.25)
    h_t = hist(lambda r: generate(params, cfg, cond, r, n, n_chunks=1, **kw))
    h_d = hist(lambda r: generate(draft, cfg, cond, r, n, n_chunks=1, **kw))
    h_s = hist(lambda r: spec_generate(params, cfg, draft, cfg, cond, r, n,
                                       spec_k=3, **kw))
    tv_spec = 0.5 * np.abs(h_s - h_t).sum()
    tv_draft = 0.5 * np.abs(h_d - h_t).sum()
    assert tv_draft > 0.15, "test has no power: draft too close to target"
    assert tv_spec < tv_draft / 2
    assert tv_spec < 0.08, f"spec marginal off target: TV={tv_spec:.3f}"
