"""AOT serving artifacts: the engine's compiled programs as portable StableHLO.

vLLM removes decode launch overhead by capturing CUDA graphs per decode
batch size at engine start (ref autoregressive/serve/model_runner.py:982-1160
`capture_model` / `CUDAGraphRunner`) — those captures live only in process
memory and are redone on every boot. The TPU-native analog of the
*execution* property is already the engine's jitted window scan; this module
adds the *deployment* property vLLM doesn't have: every compiled serving
program `ServeEngine` dispatches —

  - batched admission prefill, one per pow2 admission size
    (`prefill_m{M}`; engine._prefill_mini),
  - fused decode windows, one per (window k, read bucket)
    (`decode_w{K}_rb{RB}`; engine._decode_n_multi),
  - the per-layer window commit (`commit_w{K}`; engine._commit_entry) and
    admission row-scatter (`scatter_m{M}`; engine._scatter_entry_rows),
  - the chunk-grouped variants the live engine actually dispatches
    (`commitg{N}_w{K}`, `scatterg{N}_m{M}`, `insertg{N}_m{M}`;
    engine._commit_entries/_scatter_entries_rows/_insert_entries_batch,
    N = cache_group layers per call — per-layer artifacts stay for
    G=1 deployments),

serialized with `jax.export` into versioned StableHLO artifacts. Artifacts
are cross-lowered for TPU from any host (no chip needed to build them: the
CLI works from abstract shapes, no weights materialized), can be shipped to
a serving fleet, and reload + execute without the model code or retracing.

RNG crosses the artifact boundary as raw `jax.random.key_data` (uint32)
and is re-wrapped inside the graph — typed PRNG keys are a JAX-side
convention, not a StableHLO type.

Build:  ServeEngine(...).export_artifacts(path)          # from a live engine
   or:  python -m video_llamagen_tpu.serve.aot --model GPT-L --batch 128 \
            --kv-int8 --decode-window 64 --out artifacts/  # abstract, no chip
Load:   arts = load_artifacts(path)   # {name: jax.export.Exported}
        toks, pos, bufs, aux = arts["decode_w64_rb577"].call(params, ...)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

from ..core.config import GPTConfig
from ..models import gpt

MANIFEST = "manifest.json"
SUFFIX = ".stablehlo"


def _register_quant_serialization():
    """Quantized param trees contain NamedTuple leaves; jax.export needs
    their pytree nodes registered with stable serialized names (idempotent
    across repeated imports/reloads)."""
    from ..ops.qmatmul4 import PackedLinear4
    from ..ops.quant import QuantizedLinear, QuantizedLinear4
    for cls, name in ((QuantizedLinear, "vlg.QuantizedLinear"),
                      (QuantizedLinear4, "vlg.QuantizedLinear4"),
                      (PackedLinear4, "vlg.PackedLinear4")):
        try:
            jexport.register_namedtuple_serialization(cls,
                                                      serialized_name=name)
        except ValueError:
            pass  # already registered


_register_quant_serialization()


def _sds(tree):
    """ShapeDtypeStruct tree of `tree` (already-abstract leaves pass through)."""
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def _pow2_sizes(limit: int):
    out, m = [], 1
    while m < limit:
        out.append(m)
        m *= 2
    out.append(m)
    return out


def _key_data_sds():
    return jax.eval_shape(lambda: jax.random.key_data(jax.random.key(0)))


def export_serving_artifacts(params, cfg: GPTConfig, *, max_batch: int,
                             max_seq: Optional[int] = None, dtype=None,
                             kv_int8: bool = False, kv_int4: bool = False,
                             kv_merged: bool = False,
                             decode_window: int = 1,
                             windows: Optional[Sequence[int]] = None,
                             draft_params=None,
                             draft_cfg: Optional[GPTConfig] = None,
                             spec_k: int = 4, ddtype=None,
                             platforms: Sequence[str] = ("tpu",),
                             cache_group: int = 8,
                             ) -> Dict[str, jexport.Exported]:
    """Export the full serving graph set for one engine configuration.

    `params` may be real arrays OR an abstract ShapeDtypeStruct tree (e.g.
    from `abstract_params`) — export never touches values. Shape derivations
    mirror ServeEngine.__init__ exactly (rows = 2*max_batch CFG pairs,
    max_seq = cls_token_num + block_size, read buckets, pow2 admissions).
    """
    from . import engine as eng_mod

    dtype = jnp.dtype(dtype or cfg.dtype)
    params_s = _sds(params)
    rows = 2 * max_batch
    t_cond = cfg.cls_token_num
    max_seq = max_seq or (t_cond + cfg.block_size)
    read_buckets = [b for b in (128, 256, 512, 1024, 2048, 4096)
                    if b < max_seq] + [max_seq]
    windows = sorted(set(windows or {1, decode_window}))

    freqs_s = jax.eval_shape(lambda: gpt.precompute_freqs_2d(
        cfg.grid_size, cfg.head_dim, cfg.rope_base, t_cond))
    cache_s = jax.eval_shape(lambda: (
        (gpt.init_kv_cache_int8_merged(cfg, rows, max_seq) if kv_int8
         else gpt.init_kv_cache_merged(cfg, rows, max_seq, dtype))
        if kv_merged
        else gpt.init_kv_cache_int4(cfg, rows, max_seq) if kv_int4
        else gpt.init_kv_cache_int8(cfg, rows, max_seq) if kv_int8
        else gpt.init_kv_cache(cfg, rows, max_seq, dtype)))
    i32b = jax.ShapeDtypeStruct((max_batch,), jnp.int32)
    f32b = jax.ShapeDtypeStruct((max_batch,), jnp.float32)
    rows_b = jax.ShapeDtypeStruct((rows,), jnp.bool_)
    rows_i = jax.ShapeDtypeStruct((rows,), jnp.int32)
    colv_s = jax.ShapeDtypeStruct((rows, max_seq), jnp.bool_)
    kd_s = _key_data_sds()

    arts: Dict[str, jexport.Exported] = {}

    # ---- decode windows: one artifact per (window, read bucket) ----------
    def decode_fn(k, rb):
        def fn(p, slot_tokens, pos, cache, active, freqs, col_valid,
               cfg_scales, temps, top_ks, top_ps, key_data):
            rng = jax.random.wrap_key_data(key_data)
            return eng_mod._decode_n_multi(
                p, cfg, k, dtype, slot_tokens, pos, cache, active, freqs,
                col_valid, cfg_scales, temps, top_ks, top_ps, rng,
                read_bound=rb)
        return jax.jit(fn)

    win_bufs_s: Dict[int, Any] = {}
    dec_args = (params_s, i32b, rows_i, cache_s, rows_b, freqs_s, colv_s,
                f32b, f32b, i32b, f32b, kd_s)
    for k in windows:
        dec = decode_fn(k, read_buckets[0])
        win_bufs_s[k] = jax.eval_shape(dec, *dec_args)[2][0]  # one layer's bufs
        for rb in read_buckets:
            arts[f"decode_w{k}_rb{rb}"] = jexport.export(
                decode_fn(k, rb), platforms=list(platforms))(*dec_args)

    # ---- per-layer window commit: one artifact per window size -----------
    def commit_fn(entry, win_buf, pos0, active):
        return eng_mod._commit_entry(entry, win_buf, pos0, active)

    for k in windows:
        arts[f"commit_w{k}"] = jexport.export(
            jax.jit(commit_fn), platforms=list(platforms))(
                cache_s[0], _sds(win_bufs_s[k]), rows_i, rows_b)

    # ---- batched admission prefill + row scatter, per pow2 size ----------
    def prefill_fn(p, embs, masks, freqs):
        return eng_mod.ServeEngine._prefill_mini(
            p, cfg, embs, masks, freqs, kv_int8, kv_int4, dtype,
            merged=kv_merged)

    def scatter_fn(entry, mr, rws):
        return eng_mod._scatter_entry_rows(entry, mr, rws)

    mini_entry_sds: Dict[int, Any] = {}
    for m in _pow2_sizes(rows):
        emb_s = jax.ShapeDtypeStruct((m, t_cond, cfg.dim), dtype)
        mask_s = jax.ShapeDtypeStruct((m, 1, t_cond, t_cond), jnp.bool_)
        pre_args = (params_s, emb_s, mask_s, freqs_s)
        arts[f"prefill_m{m}"] = jexport.export(
            jax.jit(prefill_fn), platforms=list(platforms))(*pre_args)
        mini_entry_sds[m] = _sds(jax.eval_shape(prefill_fn, *pre_args)[1][0])
        arts[f"scatter_m{m}"] = jexport.export(
            jax.jit(scatter_fn), platforms=list(platforms))(
                cache_s[0], mini_entry_sds[m],
                jax.ShapeDtypeStruct((m,), jnp.int32))

    # ---- chunk-grouped variants: the live engine's dispatch granularity --
    n_layer = len(cache_s)
    group = max(1, min(cache_group, n_layer))
    chunk_lens = sorted({group} | ({n_layer % group} - {0}))

    def commitg_fn(entries, wbs, pos0, active):
        return eng_mod._commit_entries(entries, wbs, pos0, active)

    def scatterg_fn(entries, mrs, rws):
        return eng_mod._scatter_entries_rows(entries, mrs, rws)

    def insertg_fn(entries, hits, rws):
        return eng_mod._insert_entries_batch(entries, hits, rws)

    rows_kv_s = _sds(jax.eval_shape(
        lambda c, s: eng_mod.ServeEngine._extract_rows(c, s, t_cond),
        cache_s, jax.ShapeDtypeStruct((), jnp.int32)))
    for n in chunk_lens:
        for k in windows:
            arts[f"commitg{n}_w{k}"] = jexport.export(
                jax.jit(commitg_fn), platforms=list(platforms))(
                    [cache_s[0]] * n, [_sds(win_bufs_s[k])] * n,
                    rows_i, rows_b)
        for m in _pow2_sizes(rows):
            arts[f"scatterg{n}_m{m}"] = jexport.export(
                jax.jit(scatterg_fn), platforms=list(platforms))(
                    [cache_s[0]] * n, [mini_entry_sds[m]] * n,
                    jax.ShapeDtypeStruct((m,), jnp.int32))
        for m in _pow2_sizes(
                min(rows, eng_mod.ServeEngine._INSERT_COHORT_MAX)):
            arts[f"insertg{n}_m{m}"] = jexport.export(
                jax.jit(insertg_fn), platforms=list(platforms))(
                    [cache_s[0]] * n, [[rows_kv_s[0]] * n] * m,
                    jax.ShapeDtypeStruct((m,), jnp.int32))

    # ---- speculative serving blocks (latency mode), per read bucket ------
    if draft_params is not None:
        assert draft_cfg is not None
        ddtype = jnp.dtype(ddtype or draft_cfg.dtype)
        draft_s = _sds(draft_params)
        dfreqs_s = jax.eval_shape(lambda: gpt.precompute_freqs_2d(
            draft_cfg.grid_size, draft_cfg.head_dim, draft_cfg.rope_base,
            t_cond))
        dcache_s = jax.eval_shape(lambda: gpt.init_kv_cache(
            draft_cfg, rows, max_seq + spec_k + 1, ddtype))

        def spec_fn(rb):
            def fn(p, dp, slot_tokens, pos, cache, dcache, active, freqs,
                   dfreqs, cfg_scales, temps, top_ks, top_ps, key_data):
                rng = jax.random.wrap_key_data(key_data)
                # frozen-cache form: caches are read-only inputs and the
                # block's new KV comes back as small window buffers (the
                # engine commits per layer) — exporting a graph that took
                # AND returned both caches reserved unaliased in+out
                toks, n, twin, dwin, rng_out = eng_mod._spec_block_multi(
                    p, dp, cfg, draft_cfg, spec_k, dtype, ddtype,
                    slot_tokens, pos, cache, dcache, active, freqs, dfreqs,
                    cfg_scales, temps, top_ks, top_ps, rng, read_bound=rb)
                # typed keys are a JAX-side convention — return raw key data
                return toks, n, twin, dwin, jax.random.key_data(rng_out)
            return jax.jit(fn)

        for rb in read_buckets:
            arts[f"spec_k{spec_k}_rb{rb}"] = jexport.export(
                spec_fn(rb), platforms=list(platforms))(
                    params_s, draft_s, i32b, rows_i, cache_s, dcache_s,
                    rows_b, freqs_s, dfreqs_s, f32b, f32b, i32b, f32b, kd_s)

    return arts


def save_artifacts(path: str, arts: Dict[str, jexport.Exported],
                   cfg: GPTConfig, meta: Optional[Dict[str, Any]] = None
                   ) -> str:
    """Serialize `arts` to `path/<name>.stablehlo` + a manifest."""
    os.makedirs(path, exist_ok=True)
    manifest = {
        "jax_version": jax.__version__,
        "config": dataclasses.asdict(cfg),
        "artifacts": {},
        **(meta or {}),
    }
    for name, exp in arts.items():
        blob = exp.serialize()
        with open(os.path.join(path, name + SUFFIX), "wb") as f:
            f.write(blob)
        manifest["artifacts"][name] = {
            "bytes": len(blob), "platforms": list(exp.platforms),
        }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return path


def load_artifacts(path: str) -> Dict[str, jexport.Exported]:
    """Deserialize every artifact under `path`; call via `.call(*args)`
    with the same pytrees the exporting wrapper took (see module doc)."""
    out = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(SUFFIX):
            with open(os.path.join(path, fn), "rb") as f:
                out[fn[:-len(SUFFIX)]] = jexport.deserialize(f.read())
    return out


def load_manifest(path: str) -> Dict[str, Any]:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def abstract_params(cfg: GPTConfig, dtype=None, weight_int8: bool = False,
                    weight_int4: bool = False):
    """ShapeDtypeStruct tree of a serving param set — no memory allocated,
    so artifacts for any model size build on any host."""
    dtype = jnp.dtype(dtype or cfg.dtype)

    def build(key):
        p = gpt.init_gpt_params(key, cfg)
        p = gpt.cast_params(p, dtype)
        if weight_int8:
            from ..ops.quant import quantize_gpt_params
            p = quantize_gpt_params(p)
        if weight_int4:
            from ..ops.quant import quantize_gpt_params4
            p = quantize_gpt_params4(p)
        return p

    return jax.eval_shape(build, jax.random.key(0))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", default="GPT-L")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n-tokens", type=int, default=576)
    p.add_argument("--decode-window", type=int, default=1)
    p.add_argument("--weight-int8", action="store_true")
    p.add_argument("--weight-int4", action="store_true")
    p.add_argument("--kv-int8", action="store_true")
    p.add_argument("--kv-int4", action="store_true")
    p.add_argument("--kv-merged", action="store_true",
                   help="merged (B*KH, S, D) cache layout (GPT-7B dims; "
                        "models/gpt.init_kv_cache_merged)")
    p.add_argument("--platforms", nargs="+", default=["tpu"])
    p.add_argument("--cache-group", type=int, default=8,
                   help="layers per grouped commit/scatter/insert artifact")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from ..core.config import gpt_config
    cfg = gpt_config(args.model, vocab_size=16384, block_size=args.n_tokens,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     dtype="bfloat16")
    params_s = abstract_params(cfg, weight_int8=args.weight_int8,
                               weight_int4=args.weight_int4)
    arts = export_serving_artifacts(
        params_s, cfg, max_batch=args.batch, kv_int8=args.kv_int8,
        kv_int4=args.kv_int4, kv_merged=args.kv_merged,
        decode_window=args.decode_window,
        platforms=args.platforms, cache_group=args.cache_group)
    save_artifacts(args.out, arts, cfg, meta={
        "model": args.model, "max_batch": args.batch,
        "kv_int8": args.kv_int8, "kv_int4": args.kv_int4,
        "kv_merged": args.kv_merged,
        "weight_int8": args.weight_int8, "weight_int4": args.weight_int4,
        "decode_window": args.decode_window})
    total = sum(len(open(os.path.join(args.out, n + SUFFIX), "rb").read())
                for n in arts)
    print(json.dumps({"artifacts": len(arts), "total_bytes": total,
                      "out": args.out}))


if __name__ == "__main__":
    main()
