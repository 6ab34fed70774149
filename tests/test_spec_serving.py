"""Speculative serving (ServeEngine draft_params): the vLLM
speculative_model analog on the continuous-batching engine.

The engine's spec path must emit EXACTLY the token streams of the plain
engine (greedy via top_k=1, same rng discipline is not shared — so we pin
against generate's greedy stream, which both paths must match), handle
mixed per-request params, drain oversubscribed queues, and report
acceptance stats. Self-draft acceptance must be 1.0 (tail-write guarantee).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.inference.generate import generate
from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                 block_size=16, cls_token_num=1, model_type="c2i",
                 dtype="float32")
TINY_D = GPTConfig(dim=32, n_layer=1, n_head=2, vocab_size=97, num_classes=10,
                   block_size=16, cls_token_num=1, model_type="c2i",
                   dtype="float32")


@pytest.fixture(scope="module")
def params():
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY))


@pytest.fixture(scope="module")
def draft():
    return randomize_head(gpt.init_gpt_params(jax.random.key(7), TINY_D),
                          key=8)


def _spec_engine(params, draft, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("dtype", jnp.float32)
    return ServeEngine(params, TINY, draft_params=draft, draft_cfg=TINY_D,
                       spec_k=3, **kw)


def test_spec_engine_greedy_matches_generate(params, draft):
    """Greedy (top_k=1): spec engine stream == target-only generate stream,
    with a mismatched draft (rejection + fallback exercised)."""
    eng = _spec_engine(params, draft)
    sp = SamplingParams(max_tokens=8, top_k=1, cfg_scale=2.0)
    reqs = eng.generate([3, 5], sp, offline_fast_path=False)
    for req in reqs:
        want = np.asarray(generate(
            params, TINY, jnp.asarray([int(req.cond)]), jax.random.key(0), 8,
            cfg_scale=2.0, sample_logits=False))[0].tolist()
        assert req.tokens == want, (int(req.cond), req.tokens, want)
    stats = eng.log_stats()
    assert stats["spec_drafted"] > 0
    assert 0 <= stats["spec_alpha"] <= 1


def test_spec_engine_self_draft_full_acceptance(params):
    """Draft == target: every proposal must be accepted (alpha == 1.0) —
    the draft-cache tail-write guarantee at engine level."""
    eng = ServeEngine(params, TINY, draft_params=params, draft_cfg=TINY,
                      spec_k=3, max_batch=2, dtype=jnp.float32)
    sp = SamplingParams(max_tokens=9, top_k=1, cfg_scale=2.0)
    eng.generate([1, 4], sp, offline_fast_path=False)
    assert eng.log_stats()["spec_alpha"] == 1.0


def test_spec_engine_mixed_params_and_oversubscription(params, draft):
    """4 requests into 2 slots, one without CFG, stochastic sampling:
    queue drains, lengths exact, tokens in range."""
    eng = _spec_engine(params, draft)
    rids = [eng.add_request(np.int32(c),
                            SamplingParams(max_tokens=5 + c % 3,
                                           cfg_scale=1.0 if c == 2 else 2.0,
                                           top_k=20))
            for c in range(4)]
    done = {}
    for _ in range(200):
        for r in eng.step():
            done[r.request_id] = r
        if len(done) == 4:
            break
    assert len(done) == 4
    for c, rid in enumerate(rids):
        req = done[rid]
        assert len(req.tokens) == 5 + c % 3
        assert all(0 <= t < TINY.vocab_size for t in req.tokens)


def test_spec_engine_prefix_cache_consistent(params, draft):
    """Prefix-cache hits skip TARGET prefill but the draft still prefills:
    streams match the cache-off engine exactly (greedy)."""
    def run(**kw):
        eng = _spec_engine(params, draft, **kw)
        sp = SamplingParams(max_tokens=6, top_k=1, cfg_scale=2.0)
        out = eng.generate([np.int32(4)] * 3, sp, offline_fast_path=False)
        return [o.tokens for o in out], eng
    toks_on, eng_on = run(prefix_cache_size=32)
    toks_off, _ = run(prefix_cache_size=0)
    assert toks_on == toks_off
    assert eng_on.stats["prefix_hits"] > 0


def test_spec_engine_offline_fast_path(params, draft):
    """Uniform offline batch delegates to spec_generate; greedy stream
    equals plain generate."""
    eng = _spec_engine(params, draft)
    sp = SamplingParams(max_tokens=7, top_k=1, cfg_scale=1.5)
    out = eng.generate([2, 6], sp)           # fast path
    want = np.asarray(generate(params, TINY, jnp.asarray([2, 6]),
                               jax.random.key(0), 7, cfg_scale=1.5,
                               sample_logits=False))
    got = np.stack([o.tokens for o in out])
    np.testing.assert_array_equal(got, want)
