"""Beam search in ServeEngine (ref serve/sampler.py:340-380
_beam_search_sample, vLLM 0.4.1 semantics).

The engine runs beams through the slot-indexed KV cache, forking parent KV
rows on device when one beam spawns several children. The pin here is an
INDEPENDENT host-side beam search that teacher-forces gpt.forward over the
full prefix every step (no KV cache at all): the two must produce the same
beams with the same cumulative log-probs — which is only possible if the
engine's KV forking, candidate extraction, and bookkeeping are all exact.

Truncation note: the engine scores only each beam's top-2*bw candidates;
the reference scores the FULL vocab per beam. The selections still agree
exactly: if a candidate ranked below 2*bw within its own beam made the
global top-bw, the >=2*bw better candidates of that same beam would already
overfill the global top-bw — contradiction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                 block_size=16, cls_token_num=1, model_type="c2i",
                 dtype="float32")


@pytest.fixture(scope="module")
def params():
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY))


def _engine(params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("dtype", jnp.float32)
    return ServeEngine(params, TINY, **kw)


def _lsm(params, prefix, cond, cfg_scale):
    """log-softmax of the CFG-mixed next-token distribution after `prefix`,
    by teacher-forcing the full-context forward (no KV cache)."""
    idx = jnp.asarray([prefix], jnp.int32) if prefix else None
    c = jnp.asarray([cond])
    lg, _ = gpt.forward(params, TINY, idx, c)
    if cfg_scale > 1.0:
        lg_u, _ = gpt.forward(params, TINY, idx,
                              jnp.full_like(c, TINY.num_classes))
        lg = lg_u + (lg - lg_u) * cfg_scale
    pos = len(prefix)
    return np.asarray(jax.nn.log_softmax(lg[0, pos].astype(jnp.float32)))


def _ref_beam_search(params, cond, bw, max_tokens, cfg_scale=1.0):
    """Full-vocab host beam search; returns [(tokens, cum_lp)] best-first."""
    first = _lsm(params, [], cond, cfg_scale)
    order = np.argsort(-first)[:bw]
    beams = [([int(t)], float(first[t])) for t in order]
    for _ in range(max_tokens - 1):
        cands = []
        for toks, cum in beams:
            lsm = _lsm(params, toks, cond, cfg_scale)
            cands.extend((toks + [t], cum + float(lsm[t]))
                         for t in range(len(lsm)))
        cands.sort(key=lambda x: -x[1])
        beams = cands[:bw]
    return beams


def _run_engine_beam(params, cond, bw, max_tokens, cfg_scale=1.0, **ekw):
    eng = _engine(params, **ekw)
    sp = SamplingParams(n=bw, best_of=bw, use_beam_search=True,
                        max_tokens=max_tokens, cfg_scale=cfg_scale)
    out = eng.generate([cond], sp, offline_fast_path=True)  # must fall off
    return sorted(((list(r.tokens), r.cumulative_logprob) for r in out),
                  key=lambda x: -x[1])


@pytest.mark.parametrize("cfg_scale", [1.0, 2.0])
def test_beam_matches_teacher_forced_reference(params, cfg_scale):
    got = _run_engine_beam(params, 3, bw=4, max_tokens=5, cfg_scale=cfg_scale)
    want = _ref_beam_search(params, 3, bw=4, max_tokens=5,
                            cfg_scale=cfg_scale)
    assert [t for t, _ in got] == [t for t, _ in want]
    np.testing.assert_allclose([c for _, c in got], [c for _, c in want],
                               rtol=0, atol=2e-4)


def test_beam_scores_are_true_sequence_logprobs(params):
    # each returned cum_lp must equal the teacher-forced sum of per-token
    # log-probs of THAT sequence — KV forking bugs break this first
    for toks, cum in _run_engine_beam(params, 5, bw=3, max_tokens=4,
                                      cfg_scale=2.0):
        s, prefix = 0.0, []
        for t in toks:
            s += float(_lsm(params, prefix, 5, 2.0)[t])
            prefix.append(t)
        assert abs(s - cum) < 2e-4, (toks, s, cum)


def test_beam_beats_greedy(params):
    beams = _run_engine_beam(params, 7, bw=4, max_tokens=6)
    greedy, prefix = 0.0, []
    for _ in range(6):
        lsm = _lsm(params, prefix, 7, 1.0)
        t = int(np.argmax(lsm))
        greedy += float(lsm[t])
        prefix.append(t)
    assert beams[0][1] >= greedy - 1e-5
    # and n < best_of returns only the top n
    eng = _engine(params)
    out = eng.generate([7], SamplingParams(n=2, best_of=4,
                                           use_beam_search=True,
                                           max_tokens=6))
    assert len(out) == 2
    assert sorted((r.cumulative_logprob for r in out), reverse=True) == \
        sorted((c for _, c in beams), reverse=True)[:2]


def test_beam_unaffected_by_batchmates(params):
    solo = _run_engine_beam(params, 2, bw=2, max_tokens=4)
    eng = _engine(params, max_batch=4)
    gid = eng.add_request(2, SamplingParams(n=2, best_of=2,
                                            use_beam_search=True,
                                            max_tokens=4))
    eng.add_request(8, SamplingParams(max_tokens=9, temperature=0.8))
    eng.add_request(9, SamplingParams(max_tokens=7, top_k=20))
    done = []
    while eng.has_unfinished():
        done.extend(eng.step())
    beams = sorted(((list(r.tokens), r.cumulative_logprob)
                    for r in done if r.group_id == gid), key=lambda x: -x[1])
    # batchmates change the dispatch's batch composition, which perturbs
    # XLA reduction order — tokens must match exactly, logprobs to ~1e-5
    assert [t for t, _ in beams] == [t for t, _ in solo]
    np.testing.assert_allclose([c for _, c in beams], [c for _, c in solo],
                               rtol=0, atol=1e-4)
    assert sum(r.group_id != gid for r in done) == 2


def test_beam_admission_is_atomic(params):
    # bw=4 on a 4-slot engine behind two long-running requests: the beam
    # must wait for ALL four slots, and the request queued behind it keeps
    # FIFO order (no starvation, no partial admission)
    eng = _engine(params, max_batch=4)
    eng.add_request(1, SamplingParams(max_tokens=8))
    eng.add_request(2, SamplingParams(max_tokens=8))
    bid = eng.add_request(3, SamplingParams(n=4, best_of=4,
                                            use_beam_search=True,
                                            max_tokens=3))
    eng.add_request(4, SamplingParams(max_tokens=2))
    finish_order = []
    while eng.has_unfinished():
        for r in eng.step():
            finish_order.append(r.request_id)
    assert len(finish_order) == 7
    beams = [r for r in finish_order if r in range(bid, bid + 4)]
    assert len(beams) == 4
    # the trailing normal request was admitted only after the whole beam
    # group (FIFO), so it finishes last or with the beams, never before 1/2
    assert finish_order[0] in (0, 1) and finish_order[1] in (0, 1)


def test_beam_validation(params):
    eng = _engine(params)
    with pytest.raises(ValueError, match="best_of"):
        eng.add_request(1, SamplingParams(use_beam_search=True))
    with pytest.raises(ValueError, match="temperature|top_k|top_p"):
        eng.add_request(1, SamplingParams(n=2, use_beam_search=True,
                                          temperature=0.5))
    with pytest.raises(ValueError, match="max_batch"):
        eng.add_request(1, SamplingParams(n=8, use_beam_search=True))
    # beams refuse preemption (co-scheduled group)
    gid = eng.add_request(1, SamplingParams(n=2, use_beam_search=True,
                                            max_tokens=4))
    eng.step()
    assert not eng.swap_out(gid)


def test_beam_abort_group(params):
    eng = _engine(params)
    gid = eng.add_request(1, SamplingParams(n=3, best_of=3,
                                            use_beam_search=True,
                                            max_tokens=8))
    eng.step()
    assert eng.abort_request(gid) == 3
    assert not eng.has_unfinished()
