"""Minimized repro harness for the XLA-CPU cold-compile wrong-numerics flake.

Round-4 observation (CLAUDE.md): twice, a spec-serving CPU test failed on
its FIRST-ever run with token streams shifted by one committed window, then
passed identically on every rerun (including across cache_group sizes). A
flake whose failure shape matches a real off-by-one-window engine bug must
not be waved through with "rerun 2-3x" (VERDICT r4 weak #6).

This harness runs the exact comparison that flaked — spec-engine greedy
streams vs compiled generate's greedy stream — R times inside each of N
FRESH interpreter processes (fresh process = every XLA-CPU graph compiles
cold; there is no persistent compilation cache configured in this repo, so
"first-ever run" can only mean cold-compile state plus whatever the backend
races during it). Each iteration logs a verdict line; any mismatch dumps
both streams and the per-position diff so the shift structure is visible.

Usage:
    python scripts/probe_coldflake.py            # orchestrate N=8 processes
    python scripts/probe_coldflake.py --worker   # one process, R=3 reps
Results: results_chain/probe_coldflake.log (orchestrator appends).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(reps: int, no_async: bool = False) -> int:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if no_async:
        # discriminator: if mismatches vanish with synchronous dispatch,
        # the corruption is a race between async execution and the
        # still-compiling sibling graphs (same family as the known
        # backend_compile segfault), not an engine-state bug
        jax.config.update("jax_cpu_enable_async_dispatch", False)
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from video_llamagen_tpu.core.config import GPTConfig
    from video_llamagen_tpu.models import gpt
    from video_llamagen_tpu.inference.generate import generate
    from video_llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    TINY = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97,
                     num_classes=10, block_size=16, cls_token_num=1,
                     model_type="c2i", dtype="float32")
    TINY_D = GPTConfig(dim=32, n_layer=1, n_head=2, vocab_size=97,
                       num_classes=10, block_size=16, cls_token_num=1,
                       model_type="c2i", dtype="float32")

    def randomize_head(params, key=11, scale=0.5):
        p = dict(params)
        p["output"] = jax.numpy.asarray(
            jax.random.normal(jax.random.key(key), p["output"].shape,
                              p["output"].dtype) * scale)
        return p

    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), TINY))
    draft = randomize_head(gpt.init_gpt_params(jax.random.key(7), TINY_D),
                           key=8)

    want = np.asarray(generate(params, TINY, jnp.asarray([3, 5]),
                               jax.random.key(0), 12, cfg_scale=2.0,
                               sample_logits=False))
    rc = 0
    for rep in range(reps):
        eng = ServeEngine(params, TINY, max_batch=2, draft_params=draft,
                          draft_cfg=TINY_D, spec_k=3)
        sp = SamplingParams(max_tokens=12, top_k=1, cfg_scale=2.0)
        reqs = eng.generate([np.int32(3), np.int32(5)], sp,
                            offline_fast_path=False)
        got = np.asarray([r.tokens for r in
                          sorted(reqs, key=lambda r: r.request_id)])
        ok = bool((got == want).all())
        rec = {"rep": rep, "ok": ok}
        if not ok:
            diff = [int(i) for i in np.where((got != want).any(0))[0]]
            rec.update(got=got.tolist(), want=want.tolist(),
                       mismatch_positions=diff)
        print("COLDFLAKE " + json.dumps(rec), flush=True)
        rc |= 0 if ok else 1
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--no-async", action="store_true",
                    help="disable jax_cpu_enable_async_dispatch in workers")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("-n", type=int, default=8, help="fresh processes")
    args = ap.parse_args()
    if args.worker:
        return worker(args.reps, no_async=args.no_async)
    fails = 0
    for i in range(args.n):
        print(f"=== fresh process {i} (no_async={args.no_async}) ===",
              flush=True)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--reps", str(args.reps)]
        if args.no_async:
            cmd.append("--no-async")
        r = subprocess.run(cmd, capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            fails += 1
            sys.stdout.write(r.stderr[-2000:])
        sys.stdout.flush()
    print(f"VERDICT(no_async={args.no_async}): {fails}/{args.n} fresh "
          f"processes saw a mismatch", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
