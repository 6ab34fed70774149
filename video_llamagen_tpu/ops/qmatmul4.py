"""Packed-nibble W4A16 matmul (Pallas): guaranteed quarter weight stream.

Why this exists alongside `ops/quant.qlinear4` (the XLA s4 grouped einsum):
whether XLA streams `jnp.int4` buffers PACKED through dots on this TPU —
or upcast-materializes an s8 copy first, negating the bandwidth win — was
an open chip question, ANSWERED for the int4 KV cache by probe J/L
(results_chain/probe_j_r4.log): XLA does NOT stream s4 packed (13.6x
slower than int8, OOM on upcast temps at b256), which makes this kernel
the only viable 4-bit bandwidth path. It removes the dependence on XLA's
s4 handling entirely:
weights are packed two-nibbles-per-byte into a plain uint8 buffer on the
host side, and the kernel unpacks them in-register with integer shifts, so
the HBM stream is in*out/2 bytes by construction.

Packing layout (group-aware, no in-kernel interleave): within each
input-dim group of size `gs`, byte row i holds nibble (q[i]+8) in the LOW
nibble and (q[i+gs/2]+8) in the HIGH nibble. Unpacked low nibbles are the
group's first-half rows and high nibbles the second half, so each group
contributes two (R, gs/2) x (gs/2, OT) MXU dots — no lane re-interleave,
which Mosaic would have to materialize. The per-(group, out) scale applies
to the f32 partial sum after the dot (same order of operations as
qlinear4, so results match it to f32 rounding).

Decode-shape caveat from the int8 attempt (ops/qmatmul.py): at tiny row
counts Pallas kernels have lost to XLA's fused einsums on this chip before.
This kernel is the HEDGE, kept behind an explicit call; the A/B lives in
`scripts/probe_w4_kernel.py` and the default path stays qlinear4 until the
chip says otherwise.

Reference spec: vLLM 0.4.1 AWQ/GPTQ 4-bit serving (the reference's serve/
vendors it); grouping matches ops/quant.QuantizedLinear4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .quant import PackedLinear4, QuantizedLinear4


def pack_int4(wq: QuantizedLinear4) -> PackedLinear4:
    """QuantizedLinear4 (s4 [-7,7] + group scales) -> packed uint8 buffer."""
    in_dim, out_dim = wq.q.shape
    g = wq.gscale.shape[0]
    gs = in_dim // g
    assert gs % 2 == 0, "group size must be even to pack two rows per byte"
    q = wq.q.astype(jnp.int32).reshape(g, gs, out_dim) + 8     # [1, 15]
    lo, hi = q[:, : gs // 2], q[:, gs // 2:]
    pq = (lo | (hi << 4)).astype(jnp.uint8).reshape(in_dim // 2, out_dim)
    return PackedLinear4(pq, wq.gscale.astype(jnp.float32))


def _kernel(x_ref, pq_ref, gs_ref, out_ref, *, groups: int, gsize: int,
            dot_dtype):
    # dot_dtype: bf16 on TPU (MXU-native); f32 under interpret mode — the
    # CPU dot thunk does not implement BF16 x BF16 = F32
    r = x_ref.shape[0]
    acc = jnp.zeros((r, out_ref.shape[1]), jnp.float32)
    half = gsize // 2
    for g in range(groups):
        p32 = pq_ref[g * half:(g + 1) * half, :].astype(jnp.int32)
        w_lo = ((p32 & 15) - 8).astype(dot_dtype)             # rows [0, gs/2)
        w_hi = (((p32 >> 4) & 15) - 8).astype(dot_dtype)      # rows [gs/2, gs)
        x_lo = x_ref[:, g * gsize: g * gsize + half].astype(dot_dtype)
        x_hi = x_ref[:, g * gsize + half: (g + 1) * gsize].astype(dot_dtype)
        part = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32) \
            + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
        acc = acc + part * gs_ref[g, :][None, :]
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def qmatmul4_pallas(x: jnp.ndarray, packed: PackedLinear4,
                    out_tile: int = 256, interpret: bool = False
                    ) -> jnp.ndarray:
    """x (R, in) bf16 @ unpack(packed) -> (R, out) in x.dtype.

    Grid over output tiles only: one out-tile's packed bytes (in/2 x OT
    uint8) fit VMEM for every GPT shape in the zoo (GPT-3B ffn: 3200/2 x
    256 = 400 KB). Rows pad to the f32 sublane minimum (8)."""
    r, in_dim = x.shape
    half_rows, out_dim = packed.pq.shape
    assert in_dim == 2 * half_rows
    g = packed.gscale.shape[0]
    gsize = in_dim // g
    out_tile = min(out_tile, out_dim)
    assert out_dim % out_tile == 0, (out_dim, out_tile)

    r_pad = max(8, -(-r // 8) * 8)
    if r_pad != r:
        x = jnp.pad(x, ((0, r_pad - r), (0, 0)))
    x = x.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=g, gsize=gsize,
                          dot_dtype=jnp.float32 if interpret
                          else jnp.bfloat16),
        grid=(out_dim // out_tile,),
        in_specs=[
            pl.BlockSpec((r_pad, in_dim), lambda j: (0, 0)),
            pl.BlockSpec((half_rows, out_tile), lambda j: (0, j)),
            pl.BlockSpec((g, out_tile), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((r_pad, out_tile), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((r_pad, out_dim), x.dtype),
        interpret=interpret,
    )(x, packed.pq, packed.gscale)
    return out[:r]


def _pick_out_tile(out_dim: int) -> int:
    """Largest tile <= 256 dividing out_dim (lane-multiple preferred)."""
    for t in (256, 128, 192, 96, 64, 32, 16, 8):
        if out_dim % t == 0:
            return t
    return out_dim


def qmatmul4(x: jnp.ndarray, packed: PackedLinear4) -> jnp.ndarray:
    """Production entry: any leading batch dims; interpret mode picked by
    backend (the TPU kernel path has no CPU lowering — CPU runs interpret,
    whose timings say nothing). ops/nn.linear dispatches here on
    PackedLinear4 leaves."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = qmatmul4_pallas(x2, packed,
                          out_tile=_pick_out_tile(packed.pq.shape[1]),
                          interpret=jax.default_backend() != "tpu")
    return out.reshape(*lead, -1)


def pack_gpt_params4(params):
    """QuantizedLinear4 tree -> PackedLinear4 tree (stacked layer leaves
    pack under vmap). Composes with quant.quantize_gpt_params4; ServeEngine
    pass-through accepts the result (is_quantized_leaf covers it)."""
    def walk(t):
        if isinstance(t, QuantizedLinear4):
            if t.q.ndim == 3:          # (L, in, out) layer-stacked
                return jax.vmap(pack_int4)(t)
            return pack_int4(t)
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        return t
    return walk(params)
