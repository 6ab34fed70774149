"""InceptionV3 (FID variant) in JAX — pool3 features, logits, spatial taps.

Backs the ADM-evaluator metrics (evaluations/c2i/evaluator.py uses the TF
InceptionV3 graph; pytorch-fid publishes the same weights as
pt_inception-2015-12-05). Architecture follows torchvision inception_v3 with
the FID tweaks (average pooling excludes padding). Weights import from the
pytorch-fid / torchvision state dict via `import_inception_state_dict`
(supply the file locally — zero-egress environment).

Outputs: 2048-d pool3 features (FID), 768-d spatial mixed-6 features pooled
7x7 (sFID), 1008/1000-way softmax (Inception Score).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _conv_bn(p: Params, x: jnp.ndarray, stride: int = 1,
             padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # BN folded as scale/bias (inference)
    return jax.nn.relu(out * p["scale"].astype(x.dtype)
                       + p["bias"].astype(x.dtype))


def _avg_pool_nopad(x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """3x3 stride-1 avg pool, padding excluded from the count (FID variant)."""
    ones = jnp.ones_like(x[..., :1])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), "SAME")
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), "SAME")
    return s / c


def _max_pool(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), "VALID")


def _inception_a(p: Params, x) -> jnp.ndarray:
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x))
    b3 = _conv_bn(p["branch3x3dbl_3"],
                  _conv_bn(p["branch3x3dbl_2"],
                           _conv_bn(p["branch3x3dbl_1"], x)))
    bp = _conv_bn(p["branch_pool"], _avg_pool_nopad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p: Params, x) -> jnp.ndarray:
    b3 = _conv_bn(p["branch3x3"], x, stride=2, padding="VALID")
    bd = _conv_bn(p["branch3x3dbl_3"],
                  _conv_bn(p["branch3x3dbl_2"],
                           _conv_bn(p["branch3x3dbl_1"], x)),
                  stride=2, padding="VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p: Params, x) -> jnp.ndarray:
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_3"],
                  _conv_bn(p["branch7x7_2"], _conv_bn(p["branch7x7_1"], x)))
    bd = x
    for name in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5"):
        bd = _conv_bn(p[name], bd)
    bp = _conv_bn(p["branch_pool"], _avg_pool_nopad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p: Params, x) -> jnp.ndarray:
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x),
                  stride=2, padding="VALID")
    b7 = x
    for name in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3"):
        b7 = _conv_bn(p[name], b7)
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2, padding="VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p: Params, x, pool: str = "avg") -> jnp.ndarray:
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([_conv_bn(p["branch3x3_2a"], b3),
                          _conv_bn(p["branch3x3_2b"], b3)], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_2"], _conv_bn(p["branch3x3dbl_1"], x))
    bd = jnp.concatenate([_conv_bn(p["branch3x3dbl_3a"], bd),
                          _conv_bn(p["branch3x3dbl_3b"], bd)], axis=-1)
    if pool == "avg":
        pooled = _avg_pool_nopad(x)
    else:  # FIDInceptionE_2 uses max pool
        pooled = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                       (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    bp = _conv_bn(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_forward(params: Params, images01: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """images (B, 299, 299, 3) in [0, 1] -> (pool3 (B,2048),
    spatial (B,7,7,768)->flattened later, logits softmax (B, n_classes)).

    Input scaling matches pytorch-fid: x*2-1.
    """
    x = images01.astype(jnp.float32) * 2.0 - 1.0
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2, padding="VALID")
    x = _conv_bn(params["Conv2d_2a_3x3"], x, padding="VALID")
    x = _conv_bn(params["Conv2d_2b_3x3"], x)
    x = _max_pool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x, padding="VALID")
    x = _max_pool(x)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x)
    spatial = x[..., :768]                      # sFID tap (mixed_6 features)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    pool3 = jnp.mean(x, axis=(1, 2))            # (B, 2048)
    logits = pool3 @ params["fc"]["w"].astype(pool3.dtype) + \
        params["fc"]["b"].astype(pool3.dtype)
    return pool3, spatial, jax.nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Weight import (pytorch-fid / torchvision inception state dict)
# ---------------------------------------------------------------------------

def import_inception_state_dict(sd: Dict[str, Any]) -> Params:
    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def conv_bn(prefix):
        w = np_(sd[prefix + ".conv.weight"]).transpose(2, 3, 1, 0)
        gamma = np_(sd[prefix + ".bn.weight"])
        beta = np_(sd[prefix + ".bn.bias"])
        mean = np_(sd[prefix + ".bn.running_mean"])
        var = np_(sd[prefix + ".bn.running_var"])
        scale = gamma / np.sqrt(var + 1e-3)
        bias = beta - mean * scale
        return {"kernel": w.astype(np.float32),
                "scale": scale.astype(np.float32),
                "bias": bias.astype(np.float32)}

    params: Params = {}
    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[stem] = conv_bn(stem)

    def block(prefix, names):
        return {n: conv_bn(f"{prefix}.{n}") for n in names}

    a_names = ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
               "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        params[name] = block(name, a_names)
    params["Mixed_6a"] = block("Mixed_6a", ("branch3x3", "branch3x3dbl_1",
                                            "branch3x3dbl_2", "branch3x3dbl_3"))
    c_names = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
               "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
               "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        params[name] = block(name, c_names)
    params["Mixed_7a"] = block("Mixed_7a", ("branch3x3_1", "branch3x3_2",
                                            "branch7x7x3_1", "branch7x7x3_2",
                                            "branch7x7x3_3", "branch7x7x3_4"))
    e_names = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
               "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
               "branch3x3dbl_3b", "branch_pool")
    for name in ("Mixed_7b", "Mixed_7c"):
        params[name] = block(name, e_names)
    params["fc"] = {"w": np_(sd["fc.weight"]).T.astype(np.float32),
                    "b": np_(sd["fc.bias"]).astype(np.float32)}
    return params


# Channel/kernel spec (torchvision inception_v3 topology) — used by the
# random init below so the forward wiring is testable without weights.
def init_inception_params(rng: jax.Array, n_classes: int = 1008) -> Params:
    keys = iter(jax.random.split(rng, 128))

    def cb(kh, kw, cin, cout):
        k = jax.random.normal(next(keys), (kh, kw, cin, cout)) * 0.05
        return {"kernel": k.astype(jnp.float32),
                "scale": jnp.ones((cout,), jnp.float32),
                "bias": jnp.zeros((cout,), jnp.float32)}

    p: Params = {
        "Conv2d_1a_3x3": cb(3, 3, 3, 32),
        "Conv2d_2a_3x3": cb(3, 3, 32, 32),
        "Conv2d_2b_3x3": cb(3, 3, 32, 64),
        "Conv2d_3b_1x1": cb(1, 1, 64, 80),
        "Conv2d_4a_3x3": cb(3, 3, 80, 192),
    }

    def block_a(cin, pool_ch):
        return {"branch1x1": cb(1, 1, cin, 64),
                "branch5x5_1": cb(1, 1, cin, 48),
                "branch5x5_2": cb(5, 5, 48, 64),
                "branch3x3dbl_1": cb(1, 1, cin, 64),
                "branch3x3dbl_2": cb(3, 3, 64, 96),
                "branch3x3dbl_3": cb(3, 3, 96, 96),
                "branch_pool": cb(1, 1, cin, pool_ch)}

    p["Mixed_5b"] = block_a(192, 32)    # -> 256
    p["Mixed_5c"] = block_a(256, 64)    # -> 288
    p["Mixed_5d"] = block_a(288, 64)    # -> 288
    p["Mixed_6a"] = {"branch3x3": cb(3, 3, 288, 384),
                     "branch3x3dbl_1": cb(1, 1, 288, 64),
                     "branch3x3dbl_2": cb(3, 3, 64, 96),
                     "branch3x3dbl_3": cb(3, 3, 96, 96)}  # -> 768

    def block_c(c7):
        return {"branch1x1": cb(1, 1, 768, 192),
                "branch7x7_1": cb(1, 1, 768, c7),
                "branch7x7_2": cb(1, 7, c7, c7),
                "branch7x7_3": cb(7, 1, c7, 192),
                "branch7x7dbl_1": cb(1, 1, 768, c7),
                "branch7x7dbl_2": cb(7, 1, c7, c7),
                "branch7x7dbl_3": cb(1, 7, c7, c7),
                "branch7x7dbl_4": cb(7, 1, c7, c7),
                "branch7x7dbl_5": cb(1, 7, c7, 192),
                "branch_pool": cb(1, 1, 768, 192)}

    p["Mixed_6b"] = block_c(128)
    p["Mixed_6c"] = block_c(160)
    p["Mixed_6d"] = block_c(160)
    p["Mixed_6e"] = block_c(192)
    p["Mixed_7a"] = {"branch3x3_1": cb(1, 1, 768, 192),
                     "branch3x3_2": cb(3, 3, 192, 320),
                     "branch7x7x3_1": cb(1, 1, 768, 192),
                     "branch7x7x3_2": cb(1, 7, 192, 192),
                     "branch7x7x3_3": cb(7, 1, 192, 192),
                     "branch7x7x3_4": cb(3, 3, 192, 192)}  # -> 1280

    def block_e(cin):
        return {"branch1x1": cb(1, 1, cin, 320),
                "branch3x3_1": cb(1, 1, cin, 384),
                "branch3x3_2a": cb(1, 3, 384, 384),
                "branch3x3_2b": cb(3, 1, 384, 384),
                "branch3x3dbl_1": cb(1, 1, cin, 448),
                "branch3x3dbl_2": cb(3, 3, 448, 384),
                "branch3x3dbl_3a": cb(1, 3, 384, 384),
                "branch3x3dbl_3b": cb(3, 1, 384, 384),
                "branch_pool": cb(1, 1, cin, 192)}

    p["Mixed_7b"] = block_e(1280)       # -> 2048
    p["Mixed_7c"] = block_e(2048)       # -> 2048
    p["fc"] = {"w": (jax.random.normal(next(keys), (2048, n_classes))
                     * 0.01).astype(jnp.float32),
               "b": jnp.zeros((n_classes,), jnp.float32)}
    return p


def load_inception_checkpoint(path: str) -> Params:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_inception_state_dict(sd)


def extract_fid_features(params: Params, images_u8: np.ndarray,
                         batch: int = 32):
    """(N, H, W, 3) uint8 -> dict of pool3 / spatial / softmax arrays for
    evals.metrics.compute_fid_suite."""
    from ..data.transforms import _resize_bilinear

    fwd = jax.jit(lambda x: inception_forward(params, x))
    pools, spatials, probs = [], [], []
    for i in range(0, len(images_u8), batch):
        chunk = images_u8[i:i + batch].astype(np.float32) / 255.0
        chunk = _resize_bilinear(chunk, 299, 299)
        p3, sp, pr = fwd(jnp.asarray(chunk))
        pools.append(np.asarray(p3))
        spatials.append(np.asarray(sp).reshape(len(chunk), -1)[:, :2023])
        probs.append(np.asarray(pr))
    return {"pool3": np.concatenate(pools),
            "spatial": np.concatenate(spatials),
            "softmax": np.concatenate(probs)}



