"""Automatic prefix caching in ServeEngine (vLLM enable_prefix_caching
analog): repeated conditioning skips prefill, outputs are bit-identical to
the uncached engine, works with bf16 and int8 KV caches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import gpt_config
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
from conftest import randomize_head

CFG = gpt_config("GPT-nano", vocab_size=128, block_size=16, num_classes=10,
                 cls_token_num=1, model_type="c2i", dtype="float32")


@pytest.fixture(scope="module")
def params():
    # non-zero head: with the zero-init head, token streams depend only on
    # the rng and a corrupted KV cache would pass the bit-identity asserts
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))


def _run(params, n_req, **eng_kw):
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32, **eng_kw)
    sp = SamplingParams(max_tokens=5, cfg_scale=2.0)
    out = eng.generate([np.int32(4)] * n_req, sp, offline_fast_path=False)
    return eng, [o.tokens for o in out]


def test_repeat_cond_hits_and_matches(params):
    eng_on, toks_on = _run(params, 4, prefix_cache_size=32)
    eng_off, toks_off = _run(params, 4, prefix_cache_size=0)
    # same rng stream, same conditioning: cached engine must reproduce the
    # uncached token streams exactly
    assert toks_on == toks_off
    # request 1 misses cond+uncond; requests 2-4 hit both
    assert eng_on.stats["prefix_misses"] == 2
    assert eng_on.stats["prefix_hits"] == 6
    assert eng_off.stats["prefix_hits"] == 0


def test_distinct_conds_do_not_collide(params):
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32)
    sp = SamplingParams(max_tokens=4, cfg_scale=2.0)
    out = eng.generate([np.int32(1), np.int32(2), np.int32(1)], sp,
                       offline_fast_path=False)
    # two distinct cond prefills + one shared-uncond prefill = 3 misses;
    # third request hits its cond (same label as first) and the uncond
    assert eng.stats["prefix_misses"] == 3
    assert eng.stats["prefix_hits"] == 3
    # determinism sanity: same-label requests got real tokens
    assert all(len(o.tokens) == 4 for o in out)


def test_prefix_cache_with_int8_kv(params):
    eng_on, toks_on = _run(params, 3, kv_int8=True, prefix_cache_size=32)
    eng_off, toks_off = _run(params, 3, kv_int8=True, prefix_cache_size=0)
    assert toks_on == toks_off
    assert eng_on.stats["prefix_hits"] == 4


def test_lru_eviction(params):
    eng = ServeEngine(params, CFG, max_batch=1, dtype=jnp.float32,
                      prefix_cache_size=2)
    sp = SamplingParams(max_tokens=2, cfg_scale=1.0)   # no uncond rows
    for label in (0, 1, 2, 0):
        eng.generate([np.int32(label)], sp, offline_fast_path=False)
    # capacity 2: label 0 was evicted by (1, 2) and re-misses at the end
    assert eng.stats["prefix_misses"] == 4
    assert len(eng.prefix_cache) == 2


def test_swap_out_and_resume(params):
    """vLLM CPU-swap analog: preempt a running request, run another to
    completion in its slot, resume — near-greedy tokens match a solo run."""
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    sp = SamplingParams(max_tokens=6, cfg_scale=2.0, temperature=1e-4)

    eng = ServeEngine(params, CFG, max_batch=1, dtype=jnp.float32)
    a = eng.add_request(np.int32(4), sp)
    done = {}
    for _ in range(3):
        for r in eng.step():
            done[r.request_id] = r
    assert eng.swap_out(a)                       # A mid-flight -> host
    b = eng.add_request(np.int32(7), sp)
    while eng.has_unfinished():
        for r in eng.step():
            done[r.request_id] = r
    assert eng.stats["swap_outs"] == 1 and eng.stats["swap_ins"] == 1
    assert len(done[a].tokens) == 6 and len(done[b].tokens) == 6

    # near-greedy solo reference for A's conditioning
    ref = ServeEngine(params, CFG, max_batch=1, dtype=jnp.float32)
    ra = ref.add_request(np.int32(4), sp)
    ref_done = {}
    while ref.has_unfinished():
        for r in ref.step():
            ref_done[r.request_id] = r
    assert done[a].tokens == ref_done[ra].tokens


def test_swap_out_and_resume_int8_kv(params):
    """Swap round-trip over the SEQ-MINOR int8 cache: _extract_rows /
    _insert_rows slice the seq axis LAST for kT/vT (entry_seq_axis) — a
    layout bug here silently corrupts resumed requests' KV rows."""
    sp = SamplingParams(max_tokens=6, cfg_scale=2.0, temperature=1e-4)

    eng = ServeEngine(params, CFG, max_batch=1, dtype=jnp.float32,
                      kv_int8=True)
    a = eng.add_request(np.int32(4), sp)
    done = {}
    for _ in range(3):
        for r in eng.step():
            done[r.request_id] = r
    assert eng.swap_out(a)
    b = eng.add_request(np.int32(7), sp)
    while eng.has_unfinished():
        for r in eng.step():
            done[r.request_id] = r
    assert len(done[a].tokens) == 6 and len(done[b].tokens) == 6

    ref = ServeEngine(params, CFG, max_batch=1, dtype=jnp.float32,
                      kv_int8=True)
    ra = ref.add_request(np.int32(4), sp)
    ref_done = {}
    while ref.has_unfinished():
        for r in ref.step():
            ref_done[r.request_id] = r
    assert done[a].tokens == ref_done[ra].tokens
