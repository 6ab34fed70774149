"""AOT serving artifacts (serve/aot.py): jax.export'd engine graphs.

The deployable counterpart of vLLM's CUDA-graph capture (ref
autoregressive/serve/model_runner.py:982-1160 capture_model): every
compiled serving program serialized to StableHLO, reloadable without model
code. Pins: (1) the artifact set covers (windows x read buckets) +
admission sizes, (2) a deserialized decode window is BIT-IDENTICAL to the
in-process jitted call, (3) a full admission->decode->commit flow driven
purely from deserialized artifacts reproduces the direct path, (4)
cross-lowering for 'tpu' works from this CPU-only host, (5) the engine
method writes a loadable directory."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.serve import aot
from video_llamagen_tpu.serve import engine as eng_mod

TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                 block_size=16, cls_token_num=1, model_type="c2i",
                 dtype="float32")
BATCH, ROWS, WINDOW = 2, 4, 4
MAX_SEQ = TINY.cls_token_num + TINY.block_size          # 17


@pytest.fixture(scope="module")
def params():
    # randomize_head: artifact-vs-direct token comparisons would otherwise
    # be rng-only (zero logits) and pass for any broken artifact
    return randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY))


@pytest.fixture(scope="module")
def artifacts(params, tmp_path_factory):
    arts = aot.export_serving_artifacts(
        params, TINY, max_batch=BATCH, decode_window=WINDOW,
        platforms=("cpu",))
    d = tmp_path_factory.mktemp("aot")
    aot.save_artifacts(str(d), arts, TINY, meta={"max_batch": BATCH})
    return str(d)


def _decode_args(params, cache, pos_val=1):
    freqs = gpt.precompute_freqs_2d(TINY.grid_size, TINY.head_dim,
                                    TINY.rope_base, TINY.cls_token_num)
    return dict(
        p=params, slot_tokens=jnp.asarray([3, 5], jnp.int32),
        pos=jnp.full(ROWS, pos_val, jnp.int32), cache=cache,
        active=jnp.ones(ROWS, bool), freqs=freqs,
        col_valid=jnp.ones((ROWS, MAX_SEQ), bool),
        cfg_scales=jnp.full(BATCH, 1.5, jnp.float32),
        temps=jnp.ones(BATCH, jnp.float32),
        top_ks=jnp.full(BATCH, 10, jnp.int32),
        top_ps=jnp.ones(BATCH, jnp.float32))


def test_artifact_set_covers_engine_graphs(artifacts):
    loaded = aot.load_artifacts(artifacts)
    names = set(loaded)
    assert {"decode_w1_rb17", f"decode_w{WINDOW}_rb17", "commit_w1",
            f"commit_w{WINDOW}", "prefill_m1", "prefill_m2", "prefill_m4",
            "scatter_m4"} <= names
    man = aot.load_manifest(artifacts)
    assert man["config"]["dim"] == TINY.dim
    assert all(v["bytes"] > 0 for v in man["artifacts"].values())


def test_decode_artifact_bit_identical(params, artifacts):
    loaded = aot.load_artifacts(artifacts)
    key = jax.random.key(7)
    a = _decode_args(params, gpt.init_kv_cache(TINY, ROWS, MAX_SEQ,
                                               jnp.float32))
    toks_d, pos_d, bufs_d, _ = eng_mod._decode_n_multi(
        a["p"], TINY, WINDOW, jnp.dtype("float32"), a["slot_tokens"],
        a["pos"], a["cache"], a["active"], a["freqs"], a["col_valid"],
        a["cfg_scales"], a["temps"], a["top_ks"], a["top_ps"], key,
        read_bound=MAX_SEQ)
    toks_a, pos_a, bufs_a, _ = loaded[f"decode_w{WINDOW}_rb{MAX_SEQ}"].call(
        a["p"], a["slot_tokens"], a["pos"], a["cache"], a["active"],
        a["freqs"], a["col_valid"], a["cfg_scales"], a["temps"], a["top_ks"],
        a["top_ps"], jax.random.key_data(key))
    assert (np.asarray(toks_a) == np.asarray(toks_d)).all()
    assert (np.asarray(pos_a) == np.asarray(pos_d)).all()
    for bd, ba in zip(jax.tree_util.tree_leaves(bufs_d),
                      jax.tree_util.tree_leaves(bufs_a)):
        assert (np.asarray(bd) == np.asarray(ba)).all()


def test_full_flow_from_artifacts_only(params, artifacts):
    """admission prefill -> scatter -> decode window -> commit -> second
    window, every device step a deserialized artifact; tokens must equal the
    direct in-process sequence."""
    loaded = aot.load_artifacts(artifacts)
    freqs = gpt.precompute_freqs_2d(TINY.grid_size, TINY.head_dim,
                                    TINY.rope_base, TINY.cls_token_num)
    t = TINY.cls_token_num
    conds = jnp.asarray([1, 2], jnp.int32)
    embs = jnp.concatenate([
        gpt.embed_cond(params, TINY, conds[:1], train=False,
                       dtype=jnp.float32),
        gpt.embed_cond(params, TINY, conds[1:], train=False,
                       dtype=jnp.float32)], axis=0)           # (2, T, dim)
    masks = jnp.broadcast_to(jnp.tril(jnp.ones((t, t), bool))[None, None],
                             (2, 1, t, t))
    rows = jnp.asarray([0, 2], jnp.int32)    # two requests' cond rows

    def run(prefill, scatter, decode, commit):
        logits, mini = prefill(params, embs, masks, freqs)
        cache = gpt.init_kv_cache(TINY, ROWS, MAX_SEQ, jnp.float32)
        cache = [scatter(e, mr, rows) for e, mr in zip(cache, mini)]
        a = _decode_args(params, cache, pos_val=t)
        toks_all = [np.asarray(jnp.argmax(logits, axis=-1))]
        key = jax.random.key(11)
        toks, pos, bufs, _ = decode(
            a["p"], a["slot_tokens"], a["pos"], a["cache"], a["active"],
            a["freqs"], a["col_valid"], a["cfg_scales"], a["temps"],
            a["top_ks"], a["top_ps"], key)
        cache = [commit(e, wb, pos - WINDOW, a["active"])
                 for e, wb in zip(cache, bufs)]
        toks_all.append(np.asarray(toks))
        toks2, _, _, _ = decode(
            a["p"], np.asarray(toks)[-1], pos, cache, a["active"],
            a["freqs"], a["col_valid"], a["cfg_scales"], a["temps"],
            a["top_ks"], a["top_ps"], jax.random.key(13))
        toks_all.append(np.asarray(toks2))
        return toks_all

    def direct_decode(p, st, pos, cache, active, freqs, col_valid, cs, te,
                      tk, tp, key):
        return eng_mod._decode_n_multi(p, TINY, WINDOW, jnp.dtype("float32"),
                                       jnp.asarray(st), pos, cache, active,
                                       freqs, col_valid, cs, te, tk, tp, key,
                                       read_bound=MAX_SEQ)

    direct = run(
        lambda p, e, m, f: eng_mod.ServeEngine._prefill_mini(
            p, TINY, e, m, f, False, False, jnp.dtype("float32")),
        eng_mod._scatter_entry_rows, direct_decode,
        eng_mod._commit_entry)

    la = aot.load_artifacts(artifacts)
    via_art = run(
        lambda p, e, m, f: la["prefill_m2"].call(p, e, m, f),
        lambda e, mr, r: la["scatter_m2"].call(e, mr, r),
        lambda p, st, pos, c, act, f, cv, cs, te, tk, tp, key:
            la[f"decode_w{WINDOW}_rb{MAX_SEQ}"].call(
                p, jnp.asarray(st), pos, c, act, f, cv, cs, te, tk, tp,
                jax.random.key_data(key)),
        lambda e, wb, p0, act: la[f"commit_w{WINDOW}"].call(e, wb, p0, act))

    for d, a in zip(direct, via_art):
        assert (d == a).all()
    # both windows actually sampled real tokens (head is randomized)
    assert len(np.unique(np.concatenate([x.ravel() for x in via_art]))) > 2


def test_cross_lowering_for_tpu_from_cpu_host(params):
    arts = aot.export_serving_artifacts(
        params, TINY, max_batch=1, decode_window=1, windows=[1],
        platforms=("tpu", "cpu"))
    exp = arts["decode_w1_rb17"]
    assert "tpu" in exp.platforms
    blob = exp.serialize()
    assert len(blob) > 1000
    back = jax.export.deserialize(blob)
    assert tuple(back.platforms) == tuple(exp.platforms)


def test_spec_block_artifact_bit_identical(params):
    """Speculative serving block (latency mode) exports too, and the
    deserialized graph reproduces the in-process dispatch bit for bit."""
    draft_cfg = TINY.replace(n_layer=1)
    draft_params = randomize_head(
        gpt.init_gpt_params(jax.random.key(5), draft_cfg), key=6)
    arts = aot.export_serving_artifacts(
        params, TINY, max_batch=BATCH, decode_window=1, windows=[1],
        draft_params=draft_params, draft_cfg=draft_cfg, spec_k=2,
        platforms=("cpu",))
    assert f"spec_k2_rb{MAX_SEQ}" in arts
    back = jax.export.deserialize(arts[f"spec_k2_rb{MAX_SEQ}"].serialize())

    cache = gpt.init_kv_cache(TINY, ROWS, MAX_SEQ, jnp.float32)
    dcache = gpt.init_kv_cache(draft_cfg, ROWS, MAX_SEQ + 3, jnp.float32)
    a = _decode_args(params, cache)
    dfreqs = gpt.precompute_freqs_2d(draft_cfg.grid_size, draft_cfg.head_dim,
                                     draft_cfg.rope_base,
                                     draft_cfg.cls_token_num)
    key = jax.random.key(21)
    toks_d, n_d, _, _, _ = eng_mod._spec_block_multi(
        params, draft_params, TINY, draft_cfg, 2, jnp.dtype("float32"),
        jnp.dtype("float32"), a["slot_tokens"], a["pos"], cache, dcache,
        a["active"], a["freqs"], dfreqs, a["cfg_scales"], a["temps"],
        a["top_ks"], a["top_ps"], key, read_bound=MAX_SEQ)
    toks_a, n_a, _, _, _ = back.call(
        params, draft_params, a["slot_tokens"], a["pos"], cache, dcache,
        a["active"], a["freqs"], dfreqs, a["cfg_scales"], a["temps"],
        a["top_ks"], a["top_ps"], jax.random.key_data(key))
    assert (np.asarray(toks_a) == np.asarray(toks_d)).all()
    assert (np.asarray(n_a) == np.asarray(n_d)).all()


def test_engine_export_artifacts_method(params, tmp_path):
    from video_llamagen_tpu.serve.engine import ServeEngine
    eng = ServeEngine(params, TINY, max_batch=2, dtype=jnp.float32,
                      decode_window=2)
    out = eng.export_artifacts(str(tmp_path / "arts"), platforms=("cpu",))
    loaded = aot.load_artifacts(out)
    assert any(n.startswith("decode_w2") for n in loaded)
    man = aot.load_manifest(out)
    assert man["max_batch"] == 2 and man["decode_window"] == 2


def test_grouped_artifacts_match_per_layer(params, artifacts):
    """The chunk-grouped artifacts (the live engine's dispatch granularity)
    exist and reproduce the per-layer artifact composition exactly."""
    la = aot.load_artifacts(artifacts)
    assert {f"commitg2_w{WINDOW}", "scatterg2_m2", "insertg2_m2"} <= set(la)

    cache = gpt.init_kv_cache(TINY, ROWS, MAX_SEQ, jnp.float32)
    a = _decode_args(params, cache)
    toks, pos, bufs, _ = eng_mod._decode_n_multi(
        a["p"], TINY, WINDOW, jnp.dtype("float32"), a["slot_tokens"],
        a["pos"], cache, a["active"], a["freqs"], a["col_valid"],
        a["cfg_scales"], a["temps"], a["top_ks"], a["top_ps"],
        jax.random.key(3), read_bound=MAX_SEQ)
    per = [la[f"commit_w{WINDOW}"].call(e, wb, pos - WINDOW, a["active"])
           for e, wb in zip(cache, bufs)]
    grp = la[f"commitg2_w{WINDOW}"].call(list(cache), list(bufs),
                                         pos - WINDOW, a["active"])
    for d, g in zip(jax.tree_util.tree_leaves(per),
                    jax.tree_util.tree_leaves(grp)):
        assert (np.asarray(d) == np.asarray(g)).all()

    # grouped batched hit-insert: two cohort rows land where addressed
    rows_kv = eng_mod.ServeEngine._extract_rows(cache, jnp.asarray(0),
                                                TINY.cls_token_num)
    out = la["insertg2_m2"].call(list(cache), [rows_kv, rows_kv],
                                 jnp.asarray([1, 3], jnp.int32))
    for li in range(len(out)):
        for name, arr in out[li].items():
            ax = gpt.entry_seq_axis(name, arr.ndim)
            t = rows_kv[li][name].shape[ax]
            for row in (1, 3):
                got = np.take(np.asarray(arr)[row], range(t), axis=ax - 1)
                want = np.take(np.asarray(rows_kv[li][name])[0], range(t),
                               axis=ax - 1)
                assert (got == want).all()
