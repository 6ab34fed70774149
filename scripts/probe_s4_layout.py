"""s4 (int4) on-chip behavior probe: dispatch viability + effective HBM rate.

Round-4 finding: the int4-KV decode probe no longer dies at init (fixed by
jit-wrapping the s4 fill) but dies at DISPATCH — passing a jit-created s4
buffer into a second jit triggers an eager relayout device_put that recurses
on the axon backend (results_chain/probe_kv4_jkl.log). This probe answers,
in isolation and cheaply:

  A. Can a jit-produced s4 array be consumed by another jit at all
     (decode-shaped (B, KH, D, S) cache entry -> attention-score einsum)?
  B. The DECISIVE bandwidth question (CLAUDE.md open chip question): what is
     the effective HBM stream rate of an attention-score read over a big KV
     buffer for bf16 / int8 / s4-direct / uint8-packed-nibble variants?
     If s4 (or packed u8) reads at ~2x the int8 rate, int4 KV doubles the
     decode bandwidth ceiling; if XLA upcast-materializes, s4 is a dead end
     and the packed-u8 representation (bitcast to s4 IN-graph, no s4 at any
     jit boundary) is the production representation.
  C. Numerics: u8-packed + in-graph bitcast == s4-direct scores (nibble
     order verified), so the packed representation can replace s4 storage.

Usage: python scripts/probe_s4_layout.py [A B C]
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# decode-ish shape: 512 rows (batch 256 + CFG), GQA KV heads, head_dim 64,
# context 576 — the b256-kv4 headline-candidate config's KV read per step
B, KH, D, S = 512, 8, 64, 576
ITERS = 8


def _time(fn, *args):
    out = fn(*args)
    np.asarray(out)                      # sync (block_until_ready lies
    times = []                           # over the axon tunnel)
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _scores_fn(unpack=None):
    @jax.jit
    def f(kT, q):
        k = kT if unpack is None else unpack(kT)
        return jnp.einsum("bhds,bhd->bhs", k.astype(jnp.bfloat16), q,
                          preferred_element_type=jnp.float32)
    return f


def _unpack_u8(kp):
    """(B,KH,D,S//2) u8 -> (B,KH,D,S) s4 via bitcast (seq-minor nibbles)."""
    s4 = jax.lax.bitcast_convert_type(kp, jnp.int4)      # (..., S//2, 2)
    return s4.reshape(kp.shape[:-1] + (kp.shape[-1] * 2,))


def stage_A():
    print("A: jit-produced s4 -> second jit dispatch", flush=True)
    z = jax.jit(lambda: jnp.zeros((B, KH, D, S), jnp.int4))()
    q = jnp.ones((B, KH, D), jnp.bfloat16)
    f = _scores_fn()
    try:
        out = f(z, q)
        np.asarray(out)
        print("A: s4 dispatch OK", flush=True)
        return True
    except Exception as e:
        print(f"A: s4 dispatch FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    # A2: layout-matched init — compile the consumer AOT, read its expected
    # input format, and produce the init buffers IN that format via a jitted
    # identity with out_shardings (the eager relayout device_put is what
    # recurses on this backend; in-graph relayout never leaves the device)
    try:
        compiled = f.lower(jax.ShapeDtypeStruct((B, KH, D, S), jnp.int4),
                           q).compile()
        fmts = compiled.input_formats[0][0]     # (args, kwargs) -> arg 0
        z2 = jax.jit(lambda x: x, out_shardings=fmts)(z)
        out = f(z2, q)
        np.asarray(out)
        print("A2: layout-matched s4 init dispatch OK "
              f"(format {fmts})", flush=True)
        return "matched"
    except Exception as e:
        print(f"A2: layout-matched init FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return False


def stage_B(s4_ok=True):
    print("B: effective attention-score read bandwidth", flush=True)
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, KH, D)).astype(jnp.bfloat16)
    variants = [
        ("bf16", jnp.bfloat16, 2.0, None),
        ("int8", jnp.int8, 1.0, None),
    ]
    if s4_ok:
        variants.append(("s4", jnp.int4, 0.5, None))
    variants.append(("u8packed", jnp.uint8, 0.5, _unpack_u8))
    for name, dt, bytes_per, unpack in variants:
        try:
            if name == "u8packed":
                kT = jax.jit(lambda: jnp.ones((B, KH, D, S // 2),
                                              jnp.uint8) * 18)()
            else:
                kT = jax.jit(lambda dt=dt: jnp.ones((B, KH, D, S), dt))()
            f = _scores_fn(unpack)
            dt_s = _time(f, kT, q)
            gb = B * KH * D * S * bytes_per / 1e9
            print(f"B[{name}]: {1000 * dt_s:.3f} ms  kv_bytes={gb:.3f} GB  "
                  f"eff={gb / dt_s:.1f} GB/s", flush=True)
        except Exception as e:
            print(f"B[{name}] FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def stage_C():
    print("C: packed-u8 bitcast numerics vs s4 direct", flush=True)
    rs = np.random.RandomState(0)
    vals = rs.randint(-7, 8, size=(2, 2, 8, 16)).astype(np.int8)
    q = jnp.asarray(rs.randn(2, 2, 8).astype(np.float32)).astype(jnp.bfloat16)

    # pack seq-minor: byte j holds s4 elems (2j, 2j+1); low nibble first is
    # the ASSUMED bitcast order — this stage verifies it
    u = (vals.astype(np.int32) & 0xF)
    packed = (u[..., 0::2] | (u[..., 1::2] << 4)).astype(np.uint8)

    s4 = jax.jit(lambda x: x.astype(jnp.int4))(jnp.asarray(vals))
    f_direct = _scores_fn()
    f_packed = _scores_fn(_unpack_u8)
    try:
        a = np.asarray(f_direct(s4, q))
    except Exception as e:
        print(f"C: s4-direct failed ({type(e).__name__}); checking packed "
              f"against int8 reference instead", flush=True)
        a = np.asarray(_scores_fn()(jnp.asarray(vals), q))
    b = np.asarray(f_packed(jnp.asarray(packed), q))
    if np.allclose(a, b, atol=1e-2, rtol=1e-2):
        print("C: MATCH (low-nibble-first) — packed u8 can replace s4 "
              "storage", flush=True)
    else:
        # try high-nibble-first
        packed2 = ((u[..., 1::2]) | (u[..., 0::2] << 4)).astype(np.uint8)
        b2 = np.asarray(f_packed(jnp.asarray(packed2), q))
        if np.allclose(a, b2, atol=1e-2, rtol=1e-2):
            print("C: MATCH with HIGH-nibble-first packing", flush=True)
        else:
            print(f"C: MISMATCH (max diff {np.abs(a - b).max():.4f} / "
                  f"{np.abs(a - b2).max():.4f})", flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["A", "B", "C"]
    s4_ok = True
    if "A" in stages:
        s4_ok = stage_A()
    if "C" in stages:
        stage_C()
    if "B" in stages:
        stage_B(s4_ok)
