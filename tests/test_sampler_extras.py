"""vLLM sampler-surface parity: penalties, min_p, logprobs, n/best_of, abort.

The reference serves through a vendored vLLM sampler with presence/frequency/
repetition penalties (ref serve/sampler.py:75,207-227), min_p (:262-277),
sampled logprobs (:93-98), parallel sampling n/best_of (:303-327), and
LLMEngine.abort_request. These tests pin the TPU engine's implementations:
the math against numpy references, and the engine-level behavior against the
plain engine's streams (neutral extras must not change a single token).
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.ops.sampling import (apply_penalties_batched,
                                             filtered_logits_batched, NEG_INF)
from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                 block_size=16, cls_token_num=1, model_type="c2i",
                 dtype="float32")


@pytest.fixture(scope="module")
def params():
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY))


def _engine(params, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("dtype", jnp.float32)
    return ServeEngine(params, TINY, **kw)


# ---------------------------------------------------------------- unit math

def test_penalties_match_numpy_reference():
    rng = np.random.default_rng(0)
    b, v = 5, 23
    logits = rng.normal(size=(b, v)).astype(np.float32) * 3
    counts = rng.integers(0, 4, size=(b, v)).astype(np.int32)
    pres = rng.uniform(0, 2, b).astype(np.float32)
    freq = rng.uniform(0, 2, b).astype(np.float32)
    rep = rng.uniform(1.0, 2.0, b).astype(np.float32)

    got = np.asarray(apply_penalties_batched(
        jnp.asarray(logits), jnp.asarray(counts), jnp.asarray(pres),
        jnp.asarray(freq), jnp.asarray(rep)))

    want = logits.copy()
    for i in range(b):
        for t in range(v):
            if counts[i, t] > 0:
                if want[i, t] > 0:
                    want[i, t] /= rep[i]
                else:
                    want[i, t] *= rep[i]
            want[i, t] -= freq[i] * counts[i, t]
            if counts[i, t] > 0:
                want[i, t] -= pres[i]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_neutral_penalties_are_identity():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 11)).astype(np.float32)
    counts = rng.integers(0, 4, size=(3, 11)).astype(np.int32)
    zero = jnp.zeros(3)
    out = np.asarray(apply_penalties_batched(
        jnp.asarray(logits), jnp.asarray(counts), zero, zero, jnp.ones(3)))
    np.testing.assert_allclose(out, logits, rtol=1e-7)


def test_min_p_filter():
    """min_p keeps exactly the tokens with prob >= min_p * max_prob."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(4, 31)).astype(np.float32) * 2
    min_p = np.asarray([0.0, 0.1, 0.5, 1.0], np.float32)
    out = np.asarray(filtered_logits_batched(
        jnp.asarray(logits), jnp.ones(4), jnp.zeros(4, jnp.int32),
        jnp.ones(4), min_p=jnp.asarray(min_p)))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    for i in range(4):
        keep = probs[i] >= min_p[i] * probs[i].max()
        assert np.array_equal(out[i] > NEG_INF / 2, keep), i
    # row 3 (min_p=1.0): only the argmax survives
    assert (out[3] > NEG_INF / 2).sum() == 1


# ------------------------------------------------------------- engine paths

def test_near_neutral_extras_keep_greedy_stream(params):
    """A vanishing frequency penalty flips the engine onto the extras graph
    but cannot move any greedy argmax — streams must match the plain path."""
    base = _engine(params).generate(
        [3, 5], SamplingParams(max_tokens=8, top_k=1, cfg_scale=2.0),
        offline_fast_path=False)
    extra = _engine(params).generate(
        [3, 5], SamplingParams(max_tokens=8, top_k=1, cfg_scale=2.0,
                               frequency_penalty=1e-9),
        offline_fast_path=False)
    for a, b in zip(base, extra):
        assert a.tokens == b.tokens


def test_huge_presence_penalty_forbids_repeats(params):
    """Greedy + presence_penalty >> logit range: a slot must never emit the
    same token twice (the histogram carries across fused-window steps)."""
    sp = SamplingParams(max_tokens=12, top_k=1, cfg_scale=2.0,
                        presence_penalty=1e6)
    reqs = _engine(params, decode_window=4).generate(
        [1, 7], sp, offline_fast_path=False)
    for r in reqs:
        assert len(r.tokens) == 12
        dup = [t for t, c in collections.Counter(r.tokens).items() if c > 1]
        assert not dup, (r.tokens, dup)


def test_min_p_one_equals_greedy(params):
    """min_p=1.0 collapses stochastic sampling to the argmax stream."""
    greedy = _engine(params).generate(
        [2], SamplingParams(max_tokens=8, top_k=1, cfg_scale=2.0),
        offline_fast_path=False)[0]
    minp = _engine(params).generate(
        [2], SamplingParams(max_tokens=8, min_p=1.0, cfg_scale=2.0),
        offline_fast_path=False)[0]
    assert minp.tokens == greedy.tokens


def test_logprobs_recorded(params):
    """top_k=1 leaves one token in the distribution -> logprob exactly 0;
    unfiltered sampling records finite negatives, one per token."""
    r1 = _engine(params).generate(
        [4], SamplingParams(max_tokens=6, top_k=1, cfg_scale=2.0,
                            logprobs=True), offline_fast_path=False)[0]
    assert r1.token_logprobs == [0.0] * 6
    r2 = _engine(params).generate(
        [4], SamplingParams(max_tokens=6, cfg_scale=2.0, logprobs=True),
        offline_fast_path=False)[0]
    assert len(r2.token_logprobs) == 6
    assert all(np.isfinite(l) and l <= 0 for l in r2.token_logprobs)
    assert r2.cumulative_logprob < 0


def test_parallel_sampling_n(params):
    """n=3 returns three sequences per prompt sharing a group id; the
    stochastic draws differ (vocab 97, 6 tokens — collision ~impossible)."""
    reqs = _engine(params).generate(
        [5], SamplingParams(max_tokens=6, cfg_scale=2.0, n=3))
    assert len(reqs) == 3
    assert len({r.group_id for r in reqs}) == 1
    assert len({tuple(r.tokens) for r in reqs}) >= 2
    # prefix cache collapsed the three identical prefills into one
    # (1 miss for cond + 1 for uncond, the rest hits/aliases)


def test_parallel_sampling_n_fast_path(params):
    """Plain n>1 fitting in one batch rides the compiled offline path
    (iid draws tiled through the batch) — grouped and distinct."""
    reqs = _engine(params, max_batch=8).generate(
        [5, 7], SamplingParams(max_tokens=6, cfg_scale=2.0, n=3))
    assert len(reqs) == 6
    gids = [r.group_id for r in reqs]
    assert len(set(gids[:3])) == 1 and len(set(gids[3:])) == 1
    assert gids[0] != gids[3]
    assert len({tuple(r.tokens) for r in reqs[:3]}) >= 2


def test_best_of_selects_top_n(params):
    """best_of=4, n=2: engine returns the 2 highest-cumulative-logprob
    sequences of the 4 sampled (checked against all 4 from the same seed:
    rerunning with n=best_of=4 reproduces the full candidate set)."""
    sp_all = SamplingParams(max_tokens=5, cfg_scale=2.0, n=4, best_of=4,
                            logprobs=True)
    all4 = _engine(params).generate([6], sp_all)
    sp_sel = SamplingParams(max_tokens=5, cfg_scale=2.0, n=2, best_of=4)
    top2 = _engine(params).generate([6], sp_sel)
    assert len(top2) == 2
    want = sorted(sorted(all4, key=lambda r: -r.cumulative_logprob)[:2],
                  key=lambda r: r.request_id)
    assert [r.tokens for r in top2] == [r.tokens for r in want]


def test_abort_request(params):
    """Abort a queued request, a running request, and a whole n-group."""
    eng = _engine(params)
    sp = SamplingParams(max_tokens=50, cfg_scale=2.0)
    r1 = eng.add_request(1, sp)
    r2 = eng.add_request(2, sp)
    r3 = eng.add_request(3, sp)               # queued (2 slots)
    eng.step()
    assert eng.abort_request(r3) == 1         # still queued
    assert eng.abort_request(r1) == 1         # running -> slot freed
    assert eng.abort_request(999) == 0        # unknown id
    done = []
    for _ in range(200):
        done += eng.step()
        if not eng.has_unfinished():
            break
    assert {r.request_id for r in done} == {r2}
    assert eng.log_stats()["aborted"] == 2

    gid = eng.add_request(4, SamplingParams(max_tokens=50, n=2))
    assert eng.abort_request(gid) == 2        # whole group dies
    assert not eng.has_unfinished()


def test_spec_engine_rejects_extras(params):
    eng = ServeEngine(params, TINY, draft_params=params, draft_cfg=TINY,
                      max_batch=2, dtype=jnp.float32)
    with pytest.raises(ValueError):
        eng.add_request(1, SamplingParams(min_p=0.5))
    with pytest.raises(ValueError):
        eng.add_request(1, SamplingParams(logprobs=True))
    # n>1 without ranking stays allowed (plain children)
    eng.add_request(1, SamplingParams(max_tokens=4, n=2))


def test_extras_admissions_land_in_place(params):
    """Oversubscribed queue with penalties active: late admissions land on
    the device-resident extras IN PLACE (_dev_admit_extras_update) instead
    of invalidating _dev. Greedy + penalties is rng-free, so every
    mid-flight-admitted request must reproduce its solo-engine stream
    exactly — which fails if a recycled slot inherits the previous
    occupant's output histogram or penalty params."""
    sp = SamplingParams(max_tokens=8, top_k=1, presence_penalty=2.5,
                        repetition_penalty=1.3)
    eng = _engine(params, max_batch=2, decode_window=2)
    for c in range(5):
        eng.add_request(c, sp)
    done = []
    steps = 0
    while eng.has_unfinished():
        done += eng.step()
        steps += 1
        assert steps < 200
    assert len(done) == 5
    for r in done:
        solo = _engine(params, max_batch=1).generate(
            [int(r.cond)], sp, offline_fast_path=False)[0]
        assert r.tokens == solo.tokens, int(r.cond)
