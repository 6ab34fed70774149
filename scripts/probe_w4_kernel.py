"""A/B the W4 weight-matmul implementations on the real chip.

Variants per decode shape (GPT-L linears, R = CFG rows):
  bf16      x @ w                      (2 bytes/weight streamed)
  w8        qlinear  (XLA s8 percol)   (1 byte)
  w4_xla    qlinear4 (XLA s4 grouped)  (0.5 bytes IF XLA streams s4 packed
                                        — the open chip question)
  w4_pallas qmatmul4_pallas            (0.5 bytes BY CONSTRUCTION: uint8
                                        nibble-packed, in-register unpack)

If w4_xla ~= w8 in time, XLA is upcast-materializing the s4 buffer and the
Pallas kernel is the real W4 path; if w4_xla ~= w4_pallas < w8, XLA streams
packed s4 fine and the kernel is redundant (keep whichever wins). Timing
chains ITERS applications inside one jit (scalar carry dependence) so the
tunnel RTT amortizes out; reports ms/op and achieved weight-stream GB/s.

Usage: python scripts/probe_w4_kernel.py [R ...]   (default 2 16 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from video_llamagen_tpu.ops.quant import (qlinear, qlinear4, quantize_weight,
                                          quantize_weight4)
from video_llamagen_tpu.ops.qmatmul4 import pack_int4, qmatmul4_pallas

SHAPES = [(1024, 3072), (2816, 1024)]     # GPT-L wqkv / ffn.w2
ITERS = 100


def bench(f, x, w_bytes, label):
    @jax.jit
    def chained(x0):
        def body(c, _):
            y = f(c)
            # scalar dependence defeats DCE; negligible vs the matmul
            return c + (jnp.sum(y) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return c

    np.asarray(chained(x))                      # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1e3
    gbs = w_bytes / (ms * 1e-3) / 1e9
    print(f"  {label:10s} {ms:8.4f} ms/op  weight-stream {gbs:7.1f} GB/s",
          flush=True)
    return ms


def main():
    rs = [int(a) for a in sys.argv[1:]] or [2, 16, 256]
    for in_dim, out_dim in SHAPES:
        w = jax.random.normal(jax.random.key(0), (in_dim, out_dim)) * 0.02
        w_bf16 = w.astype(jnp.bfloat16)
        w8 = quantize_weight(w)
        w4 = quantize_weight4(w, group=128)
        packed = pack_int4(w4)
        for r in rs:
            x = (jax.random.normal(jax.random.key(1), (r, in_dim)) * 0.1
                 ).astype(jnp.bfloat16)
            print(f"shape ({in_dim}, {out_dim}) R={r}:", flush=True)
            bench(lambda c: c @ w_bf16, x, in_dim * out_dim * 2, "bf16")
            bench(lambda c: qlinear(c, w8), x, in_dim * out_dim, "w8")
            bench(lambda c: qlinear4(c, w4), x, in_dim * out_dim // 2,
                  "w4_xla")
            try:
                bench(lambda c: qmatmul4_pallas(c, packed), x,
                      in_dim * out_dim // 2, "w4_pallas")
            except Exception as e:  # Mosaic may reject the unpack ops
                print(f"  w4_pallas  FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
