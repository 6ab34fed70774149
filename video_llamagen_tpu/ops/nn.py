"""Shared functional NN primitives (pure jnp; params are plain pytrees).

These replace torch.nn layers used across the reference (gpt.py:137-167,
vq_model.py) with a functional style that composes with jit/scan/pjit.
Convention: linear kernels are stored (in_features, out_features) so forward
is `x @ w` — torch checkpoints are transposed on import (utils/torch_import).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm computed in float32, cast back (ref gpt.py:137-148)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed.astype(dtype)) * weight.astype(dtype)


def linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense matmul; transparently accepts weight-only quantized leaves —
    int8 QuantizedLinear (per-out-channel) and int4 QuantizedLinear4
    (grouped, AWQ/GPTQ-style) from ops/quant.py — so quantized param trees
    flow through every forward/decode path unchanged (vLLM
    weight-quantization analog)."""
    if not isinstance(w, jnp.ndarray) and hasattr(w, "pq"):
        from .qmatmul4 import qmatmul4   # nibble-packed Pallas W4 path
        y = qmatmul4(x, w)
    elif not isinstance(w, jnp.ndarray) and hasattr(w, "q"):
        from .quant import QuantizedLinear4, qlinear, qlinear4
        y = qlinear4(x, w) if isinstance(w, QuantizedLinear4) else qlinear(x, w)
    else:
        y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) — the VQGAN 'nonlinearity' (ref vq_model.py:358-360)."""
    return x * jax.nn.sigmoid(x)


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def drop_path(rng: Optional[jax.Array], x: jnp.ndarray, rate,
              deterministic: bool) -> jnp.ndarray:
    """Stochastic depth over the batch axis (ref utils/drop_path.py).

    `rate` may be a traced scalar (per-layer rate inside a layer scan).
    """
    if deterministic or rng is None:
        return x
    keep = jnp.asarray(1.0 - rate, jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    # divide in the activation dtype: a traced f32 rate must not upcast bf16
    return jnp.where(mask, x * (1.0 / keep).astype(x.dtype), jnp.zeros_like(x))


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm in float32; weight/bias optional (elementwise_affine)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out.astype(dtype)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over channel-last input (..., C), computed in float32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    g = min(num_groups, c)
    spatial_axes = tuple(range(1, xf.ndim - 1))
    grouped = xf.reshape(*xf.shape[:-1], g, c // g)
    mean = jnp.mean(grouped, axis=spatial_axes + (-1,), keepdims=True)
    var = jnp.var(grouped, axis=spatial_axes + (-1,), keepdims=True)
    normed = ((grouped - mean) * jax.lax.rsqrt(var + eps)).reshape(xf.shape)
    return (normed * scale + bias).astype(dtype)


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def init_linear(rng: jax.Array, in_dim: int, out_dim: int, std: float = 0.02,
                dtype=jnp.float32, zero: bool = False) -> jnp.ndarray:
    if zero:
        return jnp.zeros((in_dim, out_dim), dtype)
    return (jax.random.normal(rng, (in_dim, out_dim)) * std).astype(dtype)


def init_embedding(rng: jax.Array, num: int, dim: int, std: float = 0.02,
                   dtype=jnp.float32) -> jnp.ndarray:
    return (jax.random.normal(rng, (num, dim)) * std).astype(dtype)


def init_conv(rng: jax.Array, kernel_shape, fan_in: Optional[int] = None,
              dtype=jnp.float32) -> dict:
    """Conv kernel in HWIO (or DHWIO) layout + zero bias, Kaiming-uniform like torch."""
    if fan_in is None:
        fan_in = 1
        for s in kernel_shape[:-1]:
            fan_in *= s
    bound = 1.0 / jnp.sqrt(fan_in)
    k = jax.random.uniform(rng, kernel_shape, minval=-bound, maxval=bound)
    return {"kernel": k.astype(dtype), "bias": jnp.zeros((kernel_shape[-1],), dtype)}
