"""Adaptive decode windows: ladder selection rules + stream invariance.

The engine fuses k decode steps per host dispatch. With max_window set, k
grows through a prewarmed pow2 ladder at full occupancy (no admission can
happen before a slot frees, so longer windows only remove host syncs —
the 10x online-vs-offline throughput gap of round 4) and shrinks back to
the base window whenever a fresh arrival could want a slot. Window size is
a dispatch-count optimization ONLY: token streams must be identical for
any (decode_window, max_window) pair.
"""

import jax
import numpy as np
import pytest

from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.serve.engine import ServeEngine, SamplingParams

TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                 block_size=64, cls_token_num=1, model_type="c2i",
                 dtype="float32")


@pytest.fixture(scope="module")
def params():
    p = dict(gpt.init_gpt_params(jax.random.key(0), TINY))
    p["output"] = jax.random.normal(jax.random.key(9),
                                    p["output"].shape) * 0.02
    return p


def test_window_ladder_shapes(params):
    eng = ServeEngine(params, TINY, max_batch=2, decode_window=4,
                      max_window=16)
    assert eng._window_ladder == [1, 4, 8, 16]
    # static engines keep the two-entry set (pre-adaptive behavior)
    eng2 = ServeEngine(params, TINY, max_batch=2, decode_window=4)
    assert eng2._window_ladder == [1, 4]
    # non-pow2 base floors to pow2
    eng3 = ServeEngine(params, TINY, max_batch=2, decode_window=6,
                      max_window=24)
    assert eng3._window_ladder == [1, 4, 8, 16]


def test_pick_window_rules(params):
    eng = ServeEngine(params, TINY, max_batch=2, decode_window=4,
                      max_window=16)
    sp = SamplingParams(max_tokens=40, cfg_scale=1.0)
    # partial occupancy, empty queue -> base window (measured on-chip:
    # growing here dropped r8 throughput 1074->843 tok/s and blew TTFT
    # 0.77->7.9 s — fast admission beats fused windows until full)
    eng.add_request(np.int32(1), sp)
    eng._admit()
    assert eng._pick_window([0]) == 4
    # full occupancy, empty queue -> max window
    eng.add_request(np.int32(2), sp)
    eng._admit()
    assert eng._pick_window([0, 1]) == 16
    # full occupancy + queued request -> clamp to nearest finish boundary
    eng.add_request(np.int32(3), sp)
    eng.slots[0].tokens = list(range(35))     # 5 tokens remain
    assert eng._pick_window([0, 1]) == 4      # ladder floor of 5
    eng.slots[0].tokens = list(range(39))     # 1 token remains
    assert eng._pick_window([0, 1]) == 1
    # queued request + free slot -> admit now (window 1)
    eng.slots[1] = None
    assert eng._pick_window([0]) == 1


def test_adaptive_stream_invariance(params):
    """Engines differing only in max_window emit identical GREEDY token
    streams, through admissions, full-occupancy growth, and finish-boundary
    clamping. (Greedy like test_decode_window_matches_per_step: sampled
    streams legitimately differ across window partitions because the engine
    splits its RNG once per dispatched window.)"""
    sp = SamplingParams(max_tokens=24, top_k=1, cfg_scale=2.0)
    conds = [3, 5, 7, 3, 9]
    streams, dispatches = {}, {}
    for mw in (None, 8, 32):
        eng = ServeEngine(params, TINY, max_batch=2, decode_window=2,
                          max_window=mw)
        for c in conds:
            eng.add_request(np.int32(c), sp)
        done, steps = [], 0
        while eng.has_unfinished():
            done += eng.step()
            steps += 1
            assert steps < 200
        streams[mw] = sorted((r.request_id, tuple(r.tokens)) for r in done)
        dispatches[mw] = steps
    assert streams[None] == streams[8] == streams[32]
    # growth actually engaged: fewer dispatches than the static run
    assert dispatches[32] < dispatches[None]


def test_prewarm_covers_ladder(params):
    """After prewarm(), a full-occupancy drive that walks the ladder traces
    no new decode-window graphs (the cold-compile-mid-run hazard)."""
    eng = ServeEngine(params, TINY, max_batch=2, decode_window=2,
                      max_window=8)
    eng.prewarm()
    from video_llamagen_tpu.serve import engine as eng_mod
    before = eng_mod._decode_n_multi._cache_size()
    sp = SamplingParams(max_tokens=16, top_k=3, cfg_scale=2.0)
    for c in (1, 2, 4):
        eng.add_request(np.int32(c), sp)
    steps = 0
    while eng.has_unfinished():
        eng.step()
        steps += 1
        assert steps < 100
    assert eng_mod._decode_n_multi._cache_size() == before
