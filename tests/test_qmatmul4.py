"""Packed-nibble W4 Pallas matmul (ops/qmatmul4.py).

Pins: packing layout roundtrips exactly; the kernel (interpret mode on CPU
— TPU perf is probe_w4_kernel.py's job) matches the dequantized matmul and
the XLA qlinear4 path within bf16 tolerance; row padding and multi-tile
output grids are correct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.ops.qmatmul4 import (PackedLinear4, pack_int4,
                                             qmatmul4_pallas)
from video_llamagen_tpu.ops.quant import (dequantize_weight4, qlinear4,
                                          quantize_weight4)


def _unpack(packed: PackedLinear4):
    half, out = packed.pq.shape
    g = packed.gscale.shape[0]
    gs = 2 * half // g
    p = np.asarray(packed.pq).astype(np.int32).reshape(g, gs // 2, out)
    lo = (p & 15) - 8
    hi = ((p >> 4) & 15) - 8
    return np.concatenate([lo, hi], axis=1).reshape(2 * half, out)


def test_pack_roundtrip_exact():
    w = jax.random.normal(jax.random.key(0), (128, 96)) * 0.05
    wq = quantize_weight4(w, group=32)
    assert _unpack(pack_int4(wq)).tolist() == np.asarray(
        wq.q.astype(jnp.int32)).tolist()


@pytest.mark.parametrize("r,in_dim,out_dim,group,out_tile",
                         [(2, 256, 512, 64, 256),   # padded rows, 2 tiles
                          (16, 128, 128, 128, 128),  # one group, one tile
                          (9, 192, 384, 48, 384)])   # odd rows, odd-ish dims
def test_kernel_matches_dequant(r, in_dim, out_dim, group, out_tile):
    w = jax.random.normal(jax.random.key(1), (in_dim, out_dim)) * 0.03
    wq = quantize_weight4(w, group=group)
    packed = pack_int4(wq)
    x = (jax.random.normal(jax.random.key(2), (r, in_dim)) * 0.1
         ).astype(jnp.bfloat16)
    got = qmatmul4_pallas(x, packed, out_tile=out_tile, interpret=True)
    assert got.shape == (r, out_dim) and got.dtype == x.dtype
    want = x.astype(jnp.float32) @ dequantize_weight4(wq, jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=0.05)
    # and agrees with the XLA s4 path on identical values (f32 there: the
    # CPU dot thunk can't run the bf16 einsum this compares against)
    xla = qlinear4(x.astype(jnp.float32), wq)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(xla, np.float32), rtol=0, atol=0.05)
