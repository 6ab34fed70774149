"""RAFT optical flow in JAX — backs the warp-error video metric.

Capability parity with reference CausalVideoVAE/.../eval/RAFT/core (raft.py,
extractor.py, update.py, corr.py + the alt_cuda_corr CUDA extension): feature
and context encoders at 1/8 resolution, 4-level correlation pyramid with
radius-4 lookups (ours: evals/correlation.py — the Pallas/XLA replacement for
the CUDA kernel), SepConvGRU update iterations, and convex upsampling.

Weights import from the published raft-things.pth / raft-sintel.pth state
dicts via `import_raft_state_dict` (zero-egress: supply the file locally).
`warp_error` implements the eval metric (flow-warp frame2 onto frame1, mean
abs difference) that eval_common_metric.py dispatches as "wraperror".
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .correlation import corr_pyramid, corr_lookup, bilinear_sample

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1):
    """torch-semantics conv: symmetric padding k//2 per side. (XLA "SAME"
    pads asymmetrically for stride 2 on even inputs — 2,3 instead of torch's
    3,3 — which broke parity on the stride-2 encoder convs.)"""
    kh, kw = p["kernel"].shape[:2]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"].astype(x.dtype)


def _instance_norm(x, p):
    """Norm dispatcher: instance norm, or eval-mode BatchNorm when the
    imported entry carries running stats (reference cnet uses norm_fn='batch',
    raft.py:55 — eval BN is a per-channel affine from running mean/var)."""
    if p is not None and "mean" in p:
        inv = jax.lax.rsqrt(p["var"] + 1e-5) * p["scale"]
        return (x - p["mean"]) * inv + p["bias"]
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    if p is not None:
        out = out * p["scale"] + p["bias"]
    return out


def _res_unit(p, x, stride=1):
    y = jax.nn.relu(_instance_norm(_conv(x, p["conv1"], stride), p.get("norm1")))
    y = jax.nn.relu(_instance_norm(_conv(y, p["conv2"]), p.get("norm2")))
    if "downsample" in p:
        x = _instance_norm(_conv(x, p["downsample"], stride),
                           p.get("norm3"))
    return jax.nn.relu(x + y)


def encoder_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """BasicEncoder (ref extractor.py): 1/8 resolution features."""
    h = jax.nn.relu(_instance_norm(_conv(x, p["conv1"], stride=2), p.get("norm1")))
    for layer_name in ("layer1", "layer2", "layer3"):
        blocks = p[layer_name]
        stride = 1 if layer_name == "layer1" else 2
        h = _res_unit(blocks[0], h, stride)
        h = _res_unit(blocks[1], h, 1)
    return _conv(h, p["conv2"])


def motion_encoder(p: Params, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    """BasicMotionEncoder (ref update.py)."""
    c = jax.nn.relu(_conv(corr, p["convc1"]))
    c = jax.nn.relu(_conv(c, p["convc2"]))
    f = jax.nn.relu(_conv(flow, p["convf1"]))
    f = jax.nn.relu(_conv(f, p["convf2"]))
    out = jax.nn.relu(_conv(jnp.concatenate([c, f], -1), p["conv"]))
    return jnp.concatenate([out, flow], axis=-1)


def sep_conv_gru(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """SepConvGRU: horizontal then vertical 1x5 / 5x1 GRU (ref update.py)."""
    for suffix in ("1", "2"):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(_conv(hx, p[f"convz{suffix}"]))
        r = jax.nn.sigmoid(_conv(hx, p[f"convr{suffix}"]))
        q = jnp.tanh(_conv(jnp.concatenate([r * h, x], -1), p[f"convq{suffix}"]))
        h = (1 - z) * h + z * q
    return h


def flow_head(p: Params, h: jnp.ndarray) -> jnp.ndarray:
    return _conv(jax.nn.relu(_conv(h, p["conv1"])), p["conv2"])


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex 8x upsampling with learned masks (ref raft.py upsample_flow)."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    pad = jnp.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # gather 3x3 neighborhoods
    neigh = jnp.stack([pad[:, dy:dy + h, dx:dx + w]
                       for dy in range(3) for dx in range(3)], axis=3)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, neigh)
    # (b,h,w,u,v,c) -> (b,h,u,w,v,c): row = 8*h_idx+u, col = 8*w_idx+v
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def raft_forward(params: Params, image1: jnp.ndarray, image2: jnp.ndarray,
                 iters: int = 20) -> jnp.ndarray:
    """images (B, H, W, 3) in [0, 255] -> flow (B, H, W, 2) at full res."""
    img1 = image1 / 127.5 - 1.0
    img2 = image2 / 127.5 - 1.0

    f1 = encoder_forward(params["fnet"], img1)
    f2 = encoder_forward(params["fnet"], img2)
    pyramid = corr_pyramid(f1, f2, num_levels=4)

    cnet = encoder_forward(params["cnet"], img1)
    hdim = cnet.shape[-1] // 2
    net, inp = jnp.tanh(cnet[..., :hdim]), jax.nn.relu(cnet[..., hdim:])

    b, h, w = f1.shape[:3]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (b, h, w, 2))
    coords1 = coords0

    up = params["update_block"]
    flow_up = None
    for _ in range(iters):
        lookups = []
        for lvl, vol in enumerate(pyramid):
            scaled = coords1 / (2 ** lvl)
            lookups.append(corr_lookup(vol, scaled, radius=4))
        corr = jnp.concatenate(lookups, axis=-1)
        flow = coords1 - coords0
        motion = motion_encoder(up["encoder"], flow, corr)
        net = sep_conv_gru(up["gru"], net, jnp.concatenate([inp, motion], -1))
        dflow = flow_head(up["flow_head"], net)
        coords1 = coords1 + dflow
        if "mask" in up:
            mask = _conv(jax.nn.relu(_conv(net, up["mask"]["conv1"])),
                         up["mask"]["conv2"]) * 0.25
            flow_up = upsample_flow_convex(coords1 - coords0, mask)
    if flow_up is None:
        flow_up = jax.image.resize(
            (coords1 - coords0) * 8.0, (b, 8 * h, 8 * w, 2), "bilinear")
    return flow_up


def warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp image by flow (the warp-error metric's core)."""
    b, h, w, c = image.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], -1)[None] + flow
    return jax.vmap(bilinear_sample)(image, coords)


def warp_error(params: Params, frames: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Mean abs error warping frame t+1 onto frame t across a clip
    (ref eval wraperror metric). frames (B, T, H, W, 3) in [0, 255]."""
    errs = []
    for t in range(frames.shape[1] - 1):
        flow = raft_forward(params, frames[:, t], frames[:, t + 1], iters)
        warped = warp(frames[:, t + 1], flow)
        errs.append(jnp.mean(jnp.abs(warped - frames[:, t]), axis=(1, 2, 3)))
    return jnp.stack(errs, axis=1).mean(axis=1)


def init_raft_params(rng: jax.Array, feat_dim: int = 32, hidden: int = 32,
                     context: int = 32) -> Params:
    """Random-init RAFT (tiny by default) for tests/smoke; real use loads
    published weights via load_raft_checkpoint."""
    from ..ops.nn import init_conv
    keys = iter(jax.random.split(rng, 64))

    def conv(kh, kw, cin, cout):
        return init_conv(next(keys), (kh, kw, cin, cout))

    def enc(out_dim):
        base = 16

        def block(cin, cout, down):
            b = {"conv1": conv(3, 3, cin, cout), "norm1": None,
                 "conv2": conv(3, 3, cout, cout), "norm2": None}
            if down:
                b["downsample"] = conv(1, 1, cin, cout)
                b["norm3"] = None
            return b

        return {
            "conv1": conv(7, 7, 3, base), "norm1": None,
            "layer1": [block(base, base, False), block(base, base, False)],
            "layer2": [block(base, 2 * base, True),
                       block(2 * base, 2 * base, False)],
            "layer3": [block(2 * base, 2 * base, True),
                       block(2 * base, 2 * base, False)],
            "conv2": conv(1, 1, 2 * base, out_dim),
        }

    corr_ch = 4 * 81  # 4 levels x (2*4+1)^2
    me_out = 64
    return {
        "fnet": enc(feat_dim),
        "cnet": enc(hidden + context),
        "update_block": {
            "encoder": {
                "convc1": conv(1, 1, corr_ch, 64),
                "convc2": conv(3, 3, 64, 48),
                "convf1": conv(7, 7, 2, 32),
                "convf2": conv(3, 3, 32, 16),
                "conv": conv(3, 3, 64, me_out - 2),
            },
            "gru": {
                "convz1": conv(1, 5, hidden + context + me_out, hidden),
                "convr1": conv(1, 5, hidden + context + me_out, hidden),
                "convq1": conv(1, 5, hidden + context + me_out, hidden),
                "convz2": conv(5, 1, hidden + context + me_out, hidden),
                "convr2": conv(5, 1, hidden + context + me_out, hidden),
                "convq2": conv(5, 1, hidden + context + me_out, hidden),
            },
            "flow_head": {"conv1": conv(3, 3, hidden, 64),
                          "conv2": conv(3, 3, 64, 2)},
        },
    }


def flolpips(lpips_params: Params, raft_params: Params, real: jnp.ndarray,
             fake: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Flow-weighted perceptual video distance (ref eval/flolpips/).

    The reference weights per-pixel LPIPS by a flow-distortion map between
    consecutive frames (its CuPy correlation kernels are replaced by
    evals/correlation.py). Here: per-frame LPIPS weighted by the normalized
    warp-error map of the real clip (regions with unpredictable motion count
    more). real/fake: (B, T, H, W, 3) in [0, 1]; returns (B,).
    """
    from ..tokenizers.vq.losses import lpips as lpips_fn

    b, t = real.shape[:2]
    scores = []
    for i in range(t - 1):
        flow = raft_forward(raft_params, real[:, i] * 255.0,
                            real[:, i + 1] * 255.0, iters)
        warped = warp(real[:, i + 1], flow)
        dist_map = jnp.mean(jnp.abs(warped - real[:, i]), axis=-1)  # (B,H,W)
        w = dist_map / jnp.maximum(
            jnp.mean(dist_map, axis=(1, 2), keepdims=True), 1e-6)
        frame_lpips = lpips_fn(lpips_params, fake[:, i] * 2 - 1,
                               real[:, i] * 2 - 1)
        scores.append(frame_lpips * jnp.mean(w, axis=(1, 2)))
    return jnp.stack(scores, axis=1).mean(axis=1)


# ---------------------------------------------------------------------------
# Torch weight import (raft-things.pth layout)
# ---------------------------------------------------------------------------

def import_raft_state_dict(sd: Dict[str, Any]) -> Params:
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def conv(prefix):
        return {"kernel": np_(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
                "bias": np_(sd[prefix + ".bias"]) if prefix + ".bias" in sd
                else np.zeros(np_(sd[prefix + ".weight"]).shape[0], np.float32)}

    def norm(prefix):
        if prefix + ".weight" not in sd:
            return None
        p = {"scale": np_(sd[prefix + ".weight"]),
             "bias": np_(sd[prefix + ".bias"])}
        if prefix + ".running_mean" in sd:  # BatchNorm (cnet): eval-mode stats
            p["mean"] = np_(sd[prefix + ".running_mean"])
            p["var"] = np_(sd[prefix + ".running_var"])
        return p

    def encoder(name):
        p = {"conv1": conv(f"{name}.conv1"), "norm1": norm(f"{name}.norm1"),
             "conv2": conv(f"{name}.conv2")}
        for li, lname in enumerate(("layer1", "layer2", "layer3"), 1):
            blocks = []
            for bi in range(2):
                pre = f"{name}.{lname}.{bi}"
                blk = {"conv1": conv(pre + ".conv1"),
                       "norm1": norm(pre + ".norm1"),
                       "conv2": conv(pre + ".conv2"),
                       "norm2": norm(pre + ".norm2")}
                if pre + ".downsample.0.weight" in sd:
                    blk["downsample"] = conv(pre + ".downsample.0")
                    blk["norm3"] = norm(pre + ".downsample.1")
                blocks.append(blk)
            p[lname] = blocks
        return p

    up = "update_block"
    params: Params = {
        "fnet": encoder("fnet"),
        "cnet": encoder("cnet"),
        "update_block": {
            "encoder": {k: conv(f"{up}.encoder.{k}")
                        for k in ("convc1", "convc2", "convf1", "convf2",
                                  "conv")},
            "gru": {k: conv(f"{up}.gru.{k}")
                    for k in ("convz1", "convr1", "convq1", "convz2",
                              "convr2", "convq2")},
            "flow_head": {"conv1": conv(f"{up}.flow_head.conv1"),
                          "conv2": conv(f"{up}.flow_head.conv2")},
        },
    }
    if f"{up}.mask.0.weight" in sd:
        params["update_block"]["mask"] = {"conv1": conv(f"{up}.mask.0"),
                                          "conv2": conv(f"{up}.mask.2")}
    return params


def load_raft_checkpoint(path: str) -> Params:
    import torch
    return import_raft_state_dict(torch.load(path, map_location="cpu",
                                             weights_only=False))
