"""Decompose the online-serving decode window cost (GPT-L, real chip).

Round-3 finding: online serving saturates at ~600 tok/s while the offline
ladder does 7.7-12.4k — ~3.3 s per 64-step window at batch 32 where the
offline path's per-iteration cost says ~0.36 s. This probe times the
engine's exact compiled window (`_decode_n_multi`) in isolation across
variants to find where the time goes:

  A  batch 32, int8 KV        (the measured online config)
  B  batch 32, bf16 KV        (isolates the int8 cache write/read path)
  C  batch 8,  bf16 KV        (the round-2 online config, for scale)
  D  batch 32, bf16, shared-pos COMMIT (dynamic_update_slice at pos0[0]
     instead of commit_entry's per-row scatter — wrong semantics, right
     cost shape: isolates the commit scatter lowering)
  E  batch 32, bf16, NO commit (frozen cache across windows — wrong
     semantics: isolates whether the window cost is reads vs commit writes)

D/E ablate the window COMMIT because that is where the engine's steady
state writes the cache (serve/engine.py _decode_n_multi + _commit_entry);
the per-step `gpt._cache_write_slots` path belongs to decode_step_multi,
which the frozen-window engine no longer calls.

Usage: python scripts/probe_multi_decode.py [A B C D E ...]
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def probe_fused(name, batch, k=64, kv_int8=False, kv_int4=False):
    """s4-safe window probe: cache init + decode windows + commits all in
    ONE jitted graph, so the jnp.int4 buffers never cross a jit boundary
    (an eager relayout device_put on an s4 array recurses over the axon
    tunnel — results_chain/probe_kv4_jkl.log killed variants J/K there).
    Steady-state window cost = (t(5 windows) - t(1 window)) / 4; both
    graphs share the scan body, so compile cost stays ~one window."""
    import functools
    from video_llamagen_tpu.core.config import gpt_config
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.serve import engine as eng_mod

    cfg = gpt_config("GPT-L", vocab_size=16384, block_size=576,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     dtype="bfloat16")
    rows = 2 * batch
    s_max = 577
    params = gpt.cast_params(gpt.init_gpt_params(jax.random.key(0), cfg),
                             jnp.bfloat16)
    freqs = gpt.precompute_freqs_2d(cfg.grid_size, cfg.head_dim,
                                    cfg.rope_base, cfg.cls_token_num)
    fn = eng_mod._decode_n_multi   # jit-in-jit inlines; statics still work

    @functools.partial(jax.jit, static_argnames=("n_win",))
    def run(params, freqs, n_win: int):
        cache = (gpt.init_kv_cache_int4(cfg, rows, s_max) if kv_int4
                 else gpt.init_kv_cache_int8(cfg, rows, s_max) if kv_int8
                 else gpt.init_kv_cache(cfg, rows, s_max, jnp.bfloat16))
        tokens = jnp.zeros(batch, jnp.int32)
        pos = jnp.full(rows, 1, jnp.int32)
        active = jnp.ones(rows, bool)
        col_valid = jnp.ones((rows, s_max), bool)
        scales = jnp.full(batch, 2.0, jnp.float32)
        temps = jnp.ones(batch, jnp.float32)
        top_ks = jnp.full(batch, 1000, jnp.int32)
        top_ps = jnp.ones(batch, jnp.float32)

        def body(carry, r):
            tokens, pos, cache = carry
            toks, pos, bufs, _ = fn(params, cfg, k, jnp.bfloat16, tokens,
                                    pos, cache, active, freqs, col_valid,
                                    scales, temps, top_ks, top_ps, r)
            cache = [gpt.commit_entry(e, wb, pos - k, active)
                     for e, wb in zip(cache, bufs)]
            return (toks[-1], pos, cache), toks[-1]

        rngs = jax.random.split(jax.random.key(0), n_win)
        _, last = jax.lax.scan(body, (tokens, pos, cache), rngs)
        return last

    def timed(n_win):
        t0 = time.perf_counter()
        np.asarray(run(params, freqs, n_win))
        return time.perf_counter() - t0

    c1 = timed(1)                      # compile + 1 window
    c5 = timed(5)                      # compile + 5 windows
    t1 = min(timed(1) for _ in range(2))
    t5 = min(timed(5) for _ in range(2))
    best = (t5 - t1) / 4
    print(f"{name}: batch {batch} kv_int8={kv_int8} kv_int4={kv_int4} "
          f"FUSED window_s={best:.3f} ms/iter={1000*best/k:.2f} "
          f"tok/s={batch*k/best:.0f} "
          f"t1={t1:.3f} t5={t5:.3f} compile1_s={c1:.1f} compile5_s={c5:.1f}",
          flush=True)


def probe(name, batch, kv_int8, scalar_pos=False, k=64, n_windows=4,
          kv_int4=False):
    if kv_int4:
        return probe_fused(name, batch, k=k, kv_int8=kv_int8,
                           kv_int4=kv_int4)
    from video_llamagen_tpu.core.config import gpt_config
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.serve import engine as eng_mod

    cfg = gpt_config("GPT-L", vocab_size=16384, block_size=576,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     dtype="bfloat16")
    rows = 2 * batch
    s_max = 577
    params = gpt.cast_params(gpt.init_gpt_params(jax.random.key(0), cfg),
                             jnp.bfloat16)

    if scalar_pos:
        assert not (kv_int8 or kv_int4), \
            "D/E commit ablations are defined for the bf16 layout only"

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def commit_dus(entry, win_buf, pos0):
        # shared-position commit: dynamic_update_slice of the whole (B,KH,k,D)
        # window at pos0[0] — wrong semantics (ignores per-row positions and
        # the active gate), same bytes as commit_entry's per-row scatter IF
        # the scatter lowers in-place
        p = pos0[0]
        out = dict(entry)
        for nm in ("k", "v"):
            out[nm] = jax.lax.dynamic_update_slice(
                entry[nm], win_buf[nm].astype(entry[nm].dtype), (0, 0, p, 0))
        return out

    cache = (gpt.init_kv_cache_int4(cfg, rows, s_max) if kv_int4
             else gpt.init_kv_cache_int8(cfg, rows, s_max) if kv_int8
             else gpt.init_kv_cache(cfg, rows, s_max, jnp.bfloat16))
    slot_tokens = jnp.zeros(batch, jnp.int32)
    pos = jnp.full(rows, 1, jnp.int32)
    active = jnp.ones(rows, bool)
    col_valid = jnp.ones((rows, s_max), bool)
    cfg_scales = jnp.full(batch, 2.0, jnp.float32)
    temps = jnp.ones(batch, jnp.float32)
    top_ks = jnp.full(batch, 1000, jnp.int32)
    top_ps = jnp.ones(batch, jnp.float32)
    freqs = gpt.precompute_freqs_2d(cfg.grid_size, cfg.head_dim,
                                    cfg.rope_base, cfg.cls_token_num)

    fn = eng_mod._decode_n_multi

    def window(tokens, pos, cache, r):
        """One engine window: fused k-step decode + per-layer commit (the
        exact steady-state online path)."""
        toks, pos, bufs, _ = fn(params, cfg, k, jnp.bfloat16, tokens, pos,
                                cache, active, freqs, col_valid, cfg_scales,
                                temps, top_ks, top_ps, r)
        if scalar_pos == "none":
            pass               # E: frozen cache, commit skipped entirely
        elif scalar_pos:
            cache = [commit_dus(e, wb, pos - k)    # D: shared-pos dus commit
                     for e, wb in zip(cache, bufs)]
        else:
            cache = [eng_mod._commit_entry(e, wb, pos - k, active)
                     for e, wb in zip(cache, bufs)]
        return toks, pos, cache

    rng = jax.random.key(0)
    t0 = time.perf_counter()
    toks, pos, cache = window(slot_tokens, pos, cache, rng)
    np.asarray(toks)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(n_windows):
        rng, r = jax.random.split(rng)
        t0 = time.perf_counter()
        toks, pos, cache = window(toks[-1], pos, cache, r)
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name}: batch {batch} kv_int8={kv_int8} kv_int4={kv_int4} "
          f"scalar_pos={scalar_pos} "
          f"window_s={best:.3f} ms/iter={1000*best/k:.2f} "
          f"tok/s={batch*k/best:.0f} compile_s={compile_s:.1f} "
          f"times={[round(t,3) for t in times]}", flush=True)


VARIANTS = {
    "A": dict(batch=32, kv_int8=True),
    "B": dict(batch=32, kv_int8=False),
    "C": dict(batch=8, kv_int8=False),
    "D": dict(batch=32, kv_int8=False, scalar_pos=True),
    "E": dict(batch=32, kv_int8=False, scalar_pos="none"),
    "F": dict(batch=64, kv_int8=False),
    # seq-minor int8 layout (kT/vT): the online throughput configs
    "G": dict(batch=64, kv_int8=True),
    "H": dict(batch=128, kv_int8=True),
    "I": dict(batch=128, kv_int8=False),
    # s4 KV (quarter stream, models/gpt.init_kv_cache_int4): does XLA keep
    # the s4 buffers packed through the window dots, or upcast-materialize?
    "J": dict(batch=128, kv_int8=False, kv_int4=True),
    "K": dict(batch=64, kv_int8=False, kv_int4=True),
    # past the bf16/int8 bandwidth knee: if J/K show s4 streams packed,
    # b256 kv4 reads the same KV bytes/step as the b128 kv8 champion
    # (12404 tok/s) with 2x the rows — the next headline candidate
    "L": dict(batch=256, kv_int8=False, kv_int4=True),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        probe(n, **VARIANTS[n])
