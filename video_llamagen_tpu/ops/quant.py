"""Weight-only int8/int4 quantization for inference (serving memory/BW lever).

int8 (`QuantizedLinear`): per-output-channel symmetric. Measured on the TPU
chip: GPT-L decode step 10.06 ms (bf16) -> 8.40 ms (int8 weights) — the
dequant doesn't fully fuse in XLA yet; a Pallas quantized matmul is the
follow-up. vLLM-parity feature surface (quantized serving weights,
ref serve/ vendors vLLM 0.4.1 whose quantization configs are AWQ/GPTQ).

int4 (`QuantizedLinear4`): symmetric with per-(input-group, out-column)
scales (group 128 along the input dim — the AWQ/GPTQ grouping). Quarter the
bf16 weight stream; at decode the weight stream is the whole cost of the
batch-1..32 regime, so this is the small-batch latency lever the way int4 KV
is the big-batch one. q is stored as jnp.int4 — XLA packs s4 two-per-byte ON
TPU (CPU stores a byte per element, so CPU timings say nothing); whether the
TPU backend streams packed bytes through the grouped dots (vs materializing
an upcast copy) is the same open chip question as int4 KV — probe variants
J/K answer it for KV and the bench_serving --weight-int4 row answers it here.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    q: jnp.ndarray       # int8 (in, out)
    scale: jnp.ndarray   # f32 (out,)


def quantize_weight(w: jnp.ndarray) -> QuantizedLinear:
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32)
                           / jnp.maximum(scale, 1e-8)), -127, 127)
    return QuantizedLinear(q.astype(jnp.int8), scale)


def qlinear(x: jnp.ndarray, wq: QuantizedLinear) -> jnp.ndarray:
    y = jax.lax.dot_general(x, wq.q.astype(x.dtype),
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * wq.scale).astype(x.dtype)


def dequantize_weight(wq: QuantizedLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (wq.q.astype(jnp.float32) * wq.scale).astype(dtype)


class QuantizedLinear4(NamedTuple):
    """W4A16 grouped weight quantization (AWQ/GPTQ-style grouping).

    The field is named `gscale` (not `scale`) on purpose: sharding rules
    (parallel/mesh.py) and dtype-cast passes discriminate int8 vs int4
    leaves purely by the NamedTuple attribute path."""
    # NOTE axon backend: s4 param tensors can crash at DISPATCH if the
    # compiled graph wants a different layout (the device_put relayout
    # recurses — results_chain/gpt7b_w4_kvm_b8.log). For serving over the
    # tunnel prefer PackedLinear4 (uint8 storage, no s4 at any boundary).
    q: jnp.ndarray        # int4 (in, out), values in [-7, 7]
    gscale: jnp.ndarray   # f32 (in // group, out)


class PackedLinear4(NamedTuple):
    """Nibble-PACKED W4 weights for the Pallas path (ops/qmatmul4.py):
    pq (in//2, out) uint8 holds two offset-8 nibbles per byte in the
    group-half layout; gscale as QuantizedLinear4. Lives here (not in
    qmatmul4.py) so quant-leaf dispatch has no import cycle."""
    pq: jnp.ndarray       # uint8 (in // 2, out)
    gscale: jnp.ndarray   # f32 (in // group, out)


def _group_size(in_dim: int, group: int) -> int:
    g = min(group, in_dim)
    while in_dim % g:
        g -= 1
    return g


def quantize_weight4(w: jnp.ndarray, group: int = 128) -> QuantizedLinear4:
    in_dim, out_dim = w.shape
    gs = _group_size(in_dim, group)
    wf = w.astype(jnp.float32).reshape(in_dim // gs, gs, out_dim)
    gscale = jnp.max(jnp.abs(wf), axis=1) / 7.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(gscale[:, None], 1e-8)), -7, 7)
    return QuantizedLinear4(q.reshape(in_dim, out_dim).astype(jnp.int4),
                            gscale)


def qlinear4(x: jnp.ndarray, wq: QuantizedLinear4) -> jnp.ndarray:
    """x @ dequant(wq) without materializing the dequantized matrix: one
    grouped dot (s4 upcast in-stream) + a per-group scale contraction."""
    in_dim, out_dim = wq.q.shape
    g = wq.gscale.shape[0]
    xg = x.reshape(*x.shape[:-1], g, in_dim // g)
    qg = wq.q.reshape(g, in_dim // g, out_dim)
    y = jnp.einsum("...gi,gio->...go", xg, qg.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return jnp.sum(y * wq.gscale, axis=-2).astype(x.dtype)


def dequantize_weight4(wq: QuantizedLinear4, dtype=jnp.bfloat16) -> jnp.ndarray:
    in_dim, out_dim = wq.q.shape
    g = wq.gscale.shape[0]
    wf = wq.q.reshape(g, in_dim // g, out_dim).astype(jnp.float32) \
        * wq.gscale[:, None]
    return wf.reshape(in_dim, out_dim).astype(dtype)


def _quantize_tree(params: Dict[str, Any], qfn) -> Dict[str, Any]:
    """Quantize the big matrices of a GPT param tree; norms/embeds stay."""
    out = dict(params)
    layers = params["layers"]
    out["layers"] = {
        "attention": {
            "wqkv": jax.vmap(qfn)(layers["attention"]["wqkv"]),
            "wo": jax.vmap(qfn)(layers["attention"]["wo"]),
        },
        "ffn": {k: jax.vmap(qfn)(layers["ffn"][k])
                for k in ("w1", "w3", "w2")},
        "attention_norm": layers["attention_norm"],
        "ffn_norm": layers["ffn_norm"],
    }
    out["output"] = qfn(params["output"])
    return out


def quantize_gpt_params(params: Dict[str, Any]) -> Dict[str, Any]:
    return _quantize_tree(params, quantize_weight)


def quantize_gpt_params4(params: Dict[str, Any],
                         group: int = 128) -> Dict[str, Any]:
    return _quantize_tree(params, lambda w: quantize_weight4(w, group))


def is_quantized_leaf(n) -> bool:
    return isinstance(n, (QuantizedLinear, QuantizedLinear4, PackedLinear4))
