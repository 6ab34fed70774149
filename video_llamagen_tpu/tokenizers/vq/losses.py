"""VQ-GAN composite losses: reconstruction + LPIPS + adversarial.

Capability parity with reference tokenizer/tokenizer_image/vq_loss.py
(VQLoss: L1/L2 recon, perceptual LPIPS, hinge/vanilla/non-saturating GAN with
disc-start warmup via adopt_weight; discriminator branch vq_loss.py:155-168),
discriminator_patchgan.py (NLayerDiscriminator) and lpips.py (VGG16 LPIPS —
architecture here, pretrained weights loaded from a local file when present).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.nn import init_conv

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# GAN losses (ref vq_loss.py:14-60)
# ---------------------------------------------------------------------------

def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def non_saturating_d_loss(logits_real, logits_fake):
    real = jnp.mean(optax_sigmoid_ce(logits_real, jnp.ones_like(logits_real)))
    fake = jnp.mean(optax_sigmoid_ce(logits_fake, jnp.zeros_like(logits_fake)))
    return real + fake


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def hinge_gen_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(logits_fake)


def non_saturating_gen_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(optax_sigmoid_ce(logits_fake, jnp.ones_like(logits_fake)))


def adopt_weight(weight: float, global_step: jnp.ndarray, threshold: int = 0,
                 value: float = 0.0) -> jnp.ndarray:
    """Zero until disc_start (ref vq_loss.py adopt_weight)."""
    return jnp.where(global_step < threshold, value, weight)


# ---------------------------------------------------------------------------
# PatchGAN discriminator (ref discriminator_patchgan.py:8-70)
# ---------------------------------------------------------------------------

def init_patchgan_params(rng: jax.Array, input_nc: int = 3, ndf: int = 64,
                         n_layers: int = 3) -> Params:
    r = iter(jax.random.split(rng, n_layers + 3))
    layers = [{"conv": init_conv(next(r), (4, 4, input_nc, ndf))}]
    nf_mult_prev, nf_mult = 1, 1
    for n in range(1, n_layers + 1):
        nf_mult_prev = nf_mult
        nf_mult = min(2 ** n, 8)
        cin, cout = ndf * nf_mult_prev, ndf * nf_mult
        layers.append({
            "conv": init_conv(next(r), (4, 4, cin, cout)),
            # BatchNorm stand-in: GroupNorm params (stable under pjit; the
            # reference uses SyncBatchNorm which needs cross-replica stats)
            "norm": {"scale": jnp.ones((cout,), jnp.float32),
                     "bias": jnp.zeros((cout,), jnp.float32)},
        })
    layers.append({"conv": init_conv(next(r), (4, 4, ndf * nf_mult, 1))})
    return {"layers": layers}


def patchgan_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C) in [-1,1] -> patch logits (B, h', w', 1)."""
    from ...ops.nn import group_norm

    def conv(x, cp, stride):
        out = jax.lax.conv_general_dilated(
            x, cp["kernel"].astype(x.dtype), (stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + cp["bias"].astype(x.dtype)

    layers = p["layers"]
    n = len(layers) - 2  # intermediate blocks (static, not a pytree leaf)
    h = jax.nn.leaky_relu(conv(x, layers[0]["conv"], 2), 0.2)
    for i, layer in enumerate(layers[1:-1]):
        stride = 2 if i < n - 1 else 1
        h = conv(h, layer["conv"], stride)
        h = group_norm(h, layer["norm"]["scale"], layer["norm"]["bias"])
        h = jax.nn.leaky_relu(h, 0.2)
    return conv(h, layers[-1]["conv"], 1)


# ---------------------------------------------------------------------------
# StyleGAN discriminator (ref discriminator_stylegan.py:13-100)
# ---------------------------------------------------------------------------

_SG_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                256: 64, 512: 32, 1024: 16}


def init_stylegan_disc_params(rng: jax.Array, input_nc: int = 3,
                              image_size: int = 256,
                              channel_multiplier: int = 1) -> Params:
    import math
    ch = {k: (v * channel_multiplier if k >= 64 else v)
          for k, v in _SG_CHANNELS.items()}
    log_size = int(math.log2(image_size))
    r = iter(jax.random.split(rng, 4 + 3 * log_size))
    cin = ch[image_size]
    p: Params = {"conv_in": init_conv(next(r), (3, 3, input_nc, cin)),
                 "blocks": []}
    for i in range(log_size, 2, -1):
        cout = ch[2 ** (i - 1)]
        p["blocks"].append({
            "conv_res": init_conv(next(r), (1, 1, cin, cout)),
            "conv1": init_conv(next(r), (3, 3, cin, cout)),
            "conv2": init_conv(next(r), (3, 3, cout, cout)),
            "down": init_conv(next(r), (3, 3, cout, cout)),
        })
        cin = cout
    p["final_conv"] = init_conv(next(r), (3, 3, cin, ch[4]))
    fan = ch[4] * 16
    k1 = jax.random.normal(next(r), (fan, ch[4])) / np.sqrt(fan)
    k2 = jax.random.normal(next(r), (ch[4], 1)) / np.sqrt(ch[4])
    p["fc1"] = {"w": k1.astype(jnp.float32),
                "b": jnp.zeros((ch[4],), jnp.float32)}
    p["fc2"] = {"w": k2.astype(jnp.float32), "b": jnp.zeros((1,), jnp.float32)}
    return p


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized [1,2,1]x[1,2,1] depthwise blur (ref Blur via kornia)."""
    f = jnp.asarray([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :])
    k = (k / k.sum()).astype(x.dtype)
    c = x.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def stylegan_disc_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C) -> logits (B, 1)."""
    import math

    def conv(x, cp, stride=1, padding="SAME"):
        out = jax.lax.conv_general_dilated(
            x, cp["kernel"].astype(x.dtype), (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + cp["bias"].astype(x.dtype)

    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    h = lrelu(conv(x, p["conv_in"]))
    for blk in p["blocks"]:
        res = conv(h, blk["conv_res"], stride=2)
        h = lrelu(conv(h, blk["conv1"]))
        h = lrelu(conv(h, blk["conv2"]))
        h = conv(_blur(h), blk["down"], stride=2)
        h = (h + res) * (1 / math.sqrt(2))
    h = lrelu(conv(h, p["final_conv"]))
    h = h.reshape(h.shape[0], -1)
    h = lrelu(h @ p["fc1"]["w"].astype(h.dtype) + p["fc1"]["b"].astype(h.dtype))
    return h @ p["fc2"]["w"].astype(h.dtype) + p["fc2"]["b"].astype(h.dtype)


# ---------------------------------------------------------------------------
# LPIPS (VGG16 feature distance; ref lpips.py)
# ---------------------------------------------------------------------------

VGG_SLICES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def init_lpips_params(rng: jax.Array) -> Params:
    """Random-init VGG16 + unit linear heads. For metric-accurate LPIPS load
    converted torchvision+lpips weights via load_lpips_npz."""
    r = iter(jax.random.split(rng, 32))
    convs = []
    cin = 3
    for n_convs, cout in VGG_SLICES:
        block = []
        for _ in range(n_convs):
            block.append(init_conv(next(r), (3, 3, cin, cout)))
            cin = cout
        convs.append(block)
    lins = [jnp.ones((c, 1, 1, 1), jnp.float32) / c for _, c in VGG_SLICES]
    return {"vgg": convs, "lins": lins,
            "shift": jnp.asarray([-0.030, -0.088, -0.188]),
            "scale": jnp.asarray([0.458, 0.448, 0.450])}


def load_lpips_npz(path: str) -> Params:
    data = np.load(path)
    convs, i = [], 0
    cin = 3
    for n_convs, cout in VGG_SLICES:
        block = []
        for _ in range(n_convs):
            block.append({"kernel": jnp.asarray(data[f"conv{i}_w"]),
                          "bias": jnp.asarray(data[f"conv{i}_b"])})
            i += 1
        convs.append(block)
    lins = [jnp.asarray(data[f"lin{j}"]) for j in range(len(VGG_SLICES))]
    return {"vgg": convs, "lins": lins,
            "shift": jnp.asarray(data["shift"]).reshape(-1),
            "scale": jnp.asarray(data["scale"]).reshape(-1)}


def lpips(p: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance; x/y (B, H, W, 3) in [-1, 1] -> (B,)."""

    def vgg_feats(img):
        h = (img - p["shift"].astype(img.dtype)) / p["scale"].astype(img.dtype)
        feats = []
        for block in p["vgg"]:
            for cp in block:
                h = jax.lax.conv_general_dilated(
                    h, cp["kernel"].astype(h.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + \
                    cp["bias"].astype(h.dtype)
                h = jax.nn.relu(h)
            feats.append(h)
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return feats

    fx, fy = vgg_feats(x), vgg_feats(y)
    total = 0.0
    for f1, f2, lin in zip(fx, fy, p["lins"]):
        n1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-10)
        n2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-10)
        d = (n1 - n2) ** 2
        w = lin.reshape(1, 1, 1, -1).astype(d.dtype)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


# ---------------------------------------------------------------------------
# Composite VQ loss (ref vq_loss.py:62-168)
# ---------------------------------------------------------------------------

DISC_FORWARDS = {"patchgan": patchgan_forward,
                 "stylegan": stylegan_disc_forward}


def init_disc_params(rng: jax.Array, disc_type: str = "patchgan",
                     input_nc: int = 3, image_size: int = 256) -> Params:
    """Discriminator init dispatch (ref vq_train.py --disc-type choice,
    vq_loss.py:62-79)."""
    if disc_type == "patchgan":
        return init_patchgan_params(rng, input_nc=input_nc)
    if disc_type == "stylegan":
        return init_stylegan_disc_params(rng, input_nc=input_nc,
                                         image_size=image_size)
    raise ValueError(f"unknown disc_type {disc_type!r}")


def calculate_adaptive_weight(nll_fn, g_fn, last_w) -> jnp.ndarray:
    """‖∇_last nll‖ / (‖∇_last g‖ + 1e-4), clipped to [0, 1e4], detached
    (ref vq_loss.py:109-115 calculate_adaptive_weight).

    Balances the adversarial gradient against the reconstruction gradient at
    the decoder's LAST LAYER so the disc can't blow up the generator — the
    round-3 on-chip VQ-16 run lost 9 dB of held-out PSNR once the disc
    engaged with a fixed weight (results_vq16). `nll_fn`/`g_fn` map the
    last-layer params to the respective scalar losses with the trunk
    activation held fixed, so each grad costs one loss-head backward, not a
    decoder backward (torch's autograd.grad w.r.t. the leaf does the same)."""
    norm = lambda t: jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(t)))
    w = norm(jax.grad(nll_fn)(last_w)) / (norm(jax.grad(g_fn)(last_w)) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4))


def generator_loss(disc_params: Params, lpips_params: Optional[Params],
                   inputs: jnp.ndarray, recons: jnp.ndarray,
                   codebook_losses: Tuple, global_step: jnp.ndarray,
                   rec_loss_type: str = "l2", rec_weight: float = 1.0,
                   perceptual_weight: float = 1.0, disc_weight: float = 0.5,
                   disc_start: int = 20000, gen_loss_type: str = "hinge",
                   disc_type: str = "patchgan", adaptive: Optional[Tuple] = None):
    """optimizer_idx=0 branch (ref vq_loss.py:117-152). Returns (loss, parts).

    `adaptive`: optional (head_fn, prehead_act, last_layer_params) — enables
    the reference's disc_adaptive_weight: head_fn(last_w, act) must rebuild
    `recons` from the (stop-gradiented) trunk activation."""

    def nll_of(r):
        rec_ = (jnp.mean(jnp.abs(inputs - r)) if rec_loss_type == "l1"
                else jnp.mean((inputs - r) ** 2))
        p_ = (jnp.mean(lpips(lpips_params, r, inputs))
              if lpips_params is not None else jnp.zeros(()))
        return rec_, p_

    disc_fwd = DISC_FORWARDS[disc_type]

    def g_of(r):
        logits_fake = disc_fwd(disc_params, r)
        return (hinge_gen_loss(logits_fake) if gen_loss_type == "hinge"
                else non_saturating_gen_loss(logits_fake))

    rec, p_loss = nll_of(recons)
    g_loss = g_of(recons)

    d_adaptive = jnp.ones(())
    if adaptive is not None:
        head_fn, act, last_w = adaptive
        act = jax.lax.stop_gradient(act)
        d_adaptive = calculate_adaptive_weight(
            lambda w: (lambda rp: rec_weight * rp[0]
                       + perceptual_weight * rp[1])(nll_of(head_fn(w, act))),
            lambda w: g_of(head_fn(w, act)), last_w)

    d_weight = adopt_weight(disc_weight, global_step, disc_start) * d_adaptive
    vq_loss_, commit_loss, entropy_loss = codebook_losses
    total = (rec_weight * rec + perceptual_weight * p_loss + d_weight * g_loss
             + vq_loss_ + commit_loss + entropy_loss)
    parts = {"rec": rec, "perceptual": p_loss, "gen_adv": g_loss,
             "vq": vq_loss_, "commit": commit_loss, "entropy": entropy_loss,
             "d_weight": d_weight, "d_adaptive": d_adaptive}
    return total, parts


def discriminator_loss(disc_params: Params, inputs: jnp.ndarray,
                       recons: jnp.ndarray, global_step: jnp.ndarray,
                       disc_start: int = 20000, disc_loss_type: str = "hinge",
                       disc_type: str = "patchgan"):
    """optimizer_idx=1 branch on detached recons (ref vq_loss.py:155-168)."""
    disc_fwd = DISC_FORWARDS[disc_type]
    logits_real = disc_fwd(disc_params, inputs)
    logits_fake = disc_fwd(disc_params, jax.lax.stop_gradient(recons))
    fn = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss,
          "non-saturating": non_saturating_d_loss}[disc_loss_type]
    d_loss = adopt_weight(1.0, global_step, disc_start) * fn(logits_real,
                                                             logits_fake)
    parts = {"disc": d_loss,
             "logits_real": jnp.mean(logits_real),
             "logits_fake": jnp.mean(logits_fake)}
    return d_loss, parts
