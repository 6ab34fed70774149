"""Pallas fused int8-weight matmul: dequantize in VMEM, never in HBM.

Streams int8 tiles into VMEM, dequantizes there, feeds the MXU. Honest
measurements on the tunneled chip (GPT-L decode step, batch 16):
bf16 10.06 ms, XLA int8 8.40 ms, this kernel 8.90 ms — XLA's int8 lowering
is already competitive there, so bf16 stays the default and int8 (either
path) is an opt-in memory/BW trade. Revisit on real v5e hardware where the
weight-stream fraction is smaller.

Small-M oriented (decode: M = batch rows ≤ 64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 512
BLOCK_K = 512


def _qmm_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                  # (M, BK) bf16
    w = w_ref[...].astype(jnp.bfloat16)             # (BK, BN) int8 -> bf16 in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """x (M, K) bf16 @ w_q (K, N) int8 * scale (N,) -> (M, N) x.dtype."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    bn = min(BLOCK_N, n)
    bk = min(BLOCK_K, k)
    pad_n = (-n) % bn
    pad_k = (-k) % bk
    xp = jnp.pad(x, ((0, 0), (0, pad_k)))
    wp = jnp.pad(w_q, ((0, pad_k), (0, pad_n)))
    sp = jnp.pad(scale, (0, pad_n))[None, :]

    out = pl.pallas_call(
        _qmm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n + pad_n), x.dtype),
        grid=((n + pad_n) // bn, (k + pad_k) // bk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:, :n]


def qlinear_pallas(x: jnp.ndarray, wq, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.quant.qlinear using the fused kernel. x (..., K)."""
    lead = x.shape[:-1]
    out = qmatmul(x.reshape(-1, x.shape[-1]), wq.q, wq.scale,
                  interpret=interpret)
    return out.reshape(*lead, -1)
