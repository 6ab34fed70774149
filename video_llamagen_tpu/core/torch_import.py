"""PyTorch checkpoint import shims.

Converts reference-format state dicts (torch pickle, names from
autoregressive/models/gpt.py and tokenizer/tokenizer_image/vq_model.py) into
this framework's param pytrees, so published LlamaGen weights run unmodified
and parity tests can compare outputs bit-close.

Tolerates the reference's checkpoint-dict zoo: DDP "model", DeepSpeed
"module", Lightning "state_dict", FSDP raw dicts, and "ema"/"ema_state_dict"
preference (ref sample_t2v_1f.py:102-109, modeling_causalvae.py:578-601).

Conventions converted:
* torch Linear (out, in) -> ours (in, out): transpose;
* torch Conv2d OIHW -> ours HWIO: transpose (2, 3, 1, 0);
* per-layer modules "layers.{i}.*" -> stacked leading layer axis.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .config import GPTConfig, VQConfig


def unwrap_state_dict(ckpt: Dict[str, Any], prefer_ema: bool = True) -> Dict[str, Any]:
    """Pull the actual weights out of any of the reference's ckpt layouts."""
    for key in (("ema", "ema_state_dict") if prefer_ema else ()):
        if key in ckpt:
            return ckpt[key]
    for key in ("model", "module", "state_dict"):
        if key in ckpt:
            return ckpt[key]
    return ckpt


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd, name) -> np.ndarray:
    return _np(sd[name]).T.astype(np.float32)


def _conv(sd, name_prefix) -> Dict[str, np.ndarray]:
    w = _np(sd[name_prefix + ".weight"]).transpose(2, 3, 1, 0).astype(np.float32)
    b = _np(sd[name_prefix + ".bias"]).astype(np.float32)
    return {"kernel": w, "bias": b}


def _gn(sd, name_prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[name_prefix + ".weight"]).astype(np.float32),
            "bias": _np(sd[name_prefix + ".bias"]).astype(np.float32)}


# ---------------------------------------------------------------------------
# GPT
# ---------------------------------------------------------------------------

def import_gpt_state_dict(sd: Dict[str, Any], cfg: GPTConfig) -> Dict[str, Any]:
    sd = unwrap_state_dict(sd)
    sd = {k.removeprefix("_orig_mod."): v for k, v in sd.items()}  # torch.compile

    if cfg.model_type == "c2i":
        cls_embedding = {"embedding":
                         _np(sd["cls_embedding.embedding_table.weight"]).astype(np.float32)}
    else:
        cls_embedding = {
            "uncond_embedding": _np(sd["cls_embedding.uncond_embedding"]).astype(np.float32),
            "cap_proj": {
                "fc1": _lin(sd, "cls_embedding.cap_proj.fc1.weight"),
                "fc2": _lin(sd, "cls_embedding.cap_proj.fc2.weight"),
            },
        }

    def stack(fn):
        return np.stack([fn(i) for i in range(cfg.n_layer)])

    layers = {
        "attention": {
            "wqkv": stack(lambda i: _lin(sd, f"layers.{i}.attention.wqkv.weight")),
            "wo": stack(lambda i: _lin(sd, f"layers.{i}.attention.wo.weight")),
        },
        "ffn": {
            "w1": stack(lambda i: _lin(sd, f"layers.{i}.feed_forward.w1.weight")),
            "w3": stack(lambda i: _lin(sd, f"layers.{i}.feed_forward.w3.weight")),
            "w2": stack(lambda i: _lin(sd, f"layers.{i}.feed_forward.w2.weight")),
        },
        "attention_norm": stack(
            lambda i: _np(sd[f"layers.{i}.attention_norm.weight"]).astype(np.float32)),
        "ffn_norm": stack(
            lambda i: _np(sd[f"layers.{i}.ffn_norm.weight"]).astype(np.float32)),
    }

    return {
        "cls_embedding": cls_embedding,
        "tok_embeddings": _np(sd["tok_embeddings.weight"]).astype(np.float32),
        "layers": layers,
        "norm": _np(sd["norm.weight"]).astype(np.float32),
        "output": _lin(sd, "output.weight"),
    }


def load_gpt_checkpoint(path: str, cfg: GPTConfig) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return import_gpt_state_dict(ckpt, cfg)


# ---------------------------------------------------------------------------
# VQ tokenizer
# ---------------------------------------------------------------------------

def _res_block(sd, prefix) -> Dict[str, Any]:
    p = {
        "norm1": _gn(sd, prefix + ".norm1"),
        "conv1": _conv(sd, prefix + ".conv1"),
        "norm2": _gn(sd, prefix + ".norm2"),
        "conv2": _conv(sd, prefix + ".conv2"),
    }
    if prefix + ".nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, prefix + ".nin_shortcut")
    return p


def _attn_block(sd, prefix) -> Dict[str, Any]:
    return {
        "norm": _gn(sd, prefix + ".norm"),
        "q": _conv(sd, prefix + ".q"),
        "k": _conv(sd, prefix + ".k"),
        "v": _conv(sd, prefix + ".v"),
        "proj_out": _conv(sd, prefix + ".proj_out"),
    }


def _enc_or_dec(sd, cfg: VQConfig, which: str) -> Dict[str, Any]:
    is_enc = which == "encoder"
    mults = cfg.encoder_ch_mult if is_enc else cfg.decoder_ch_mult
    n_levels = len(mults)
    n_res = cfg.num_res_blocks if is_enc else cfg.num_res_blocks + 1
    p: Dict[str, Any] = {"conv_in": _conv(sd, f"{which}.conv_in")}
    levels = []
    for li in range(n_levels):
        prefix = f"{which}.conv_blocks.{li}"
        level: Dict[str, Any] = {"res": [], "attn": []}
        for ri in range(n_res):
            level["res"].append(_res_block(sd, f"{prefix}.res.{ri}"))
            if f"{prefix}.attn.{ri}.norm.weight" in sd:
                level["attn"].append(_attn_block(sd, f"{prefix}.attn.{ri}"))
        if f"{prefix}.downsample.conv.weight" in sd:
            level["downsample"] = {"conv": _conv(sd, f"{prefix}.downsample.conv")}
        if f"{prefix}.upsample.conv.weight" in sd:
            level["upsample"] = {"conv": _conv(sd, f"{prefix}.upsample.conv")}
        levels.append(level)
    p["levels"] = levels
    p["mid"] = {
        "res1": _res_block(sd, f"{which}.mid.0"),
        "attn": _attn_block(sd, f"{which}.mid.1"),
        "res2": _res_block(sd, f"{which}.mid.2"),
    }
    p["norm_out"] = _gn(sd, f"{which}.norm_out")
    p["conv_out"] = _conv(sd, f"{which}.conv_out")
    return p


def import_vq_state_dict(sd: Dict[str, Any], cfg: VQConfig) -> Dict[str, Any]:
    sd = unwrap_state_dict(sd)
    return {
        "encoder": _enc_or_dec(sd, cfg, "encoder"),
        "decoder": _enc_or_dec(sd, cfg, "decoder"),
        "quantize": {"embedding":
                     _np(sd["quantize.embedding.weight"]).astype(np.float32)},
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def load_vq_checkpoint(path: str, cfg: VQConfig) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return import_vq_state_dict(ckpt, cfg)


def import_taming_vqgan_state_dict(sd: Dict[str, Any], cfg: VQConfig) -> Dict[str, Any]:
    """taming-transformers VQGAN checkpoints (ref tokenizer/vqgan/):
    encoder.down.{i}.block.{j} naming, mid.block_1/attn_1/block_2,
    quantize.embedding.weight — mapped onto our VQ pytree."""
    sd = unwrap_state_dict(sd)

    def level_block(which, i, j):
        return _res_block(sd, f"{which}.down.{i}.block.{j}"
                          if which == "encoder"
                          else f"{which}.up.{i}.block.{j}")

    n_enc = len(cfg.encoder_ch_mult)
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    levels = []
    for i in range(n_enc):
        level: Dict[str, Any] = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            level["res"].append(level_block("encoder", i, j))
            if f"encoder.down.{i}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attn_block(sd, f"encoder.down.{i}.attn.{j}"))
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = {"conv": _conv(sd, f"encoder.down.{i}.downsample.conv")}
        levels.append(level)
    enc["levels"] = levels
    enc["mid"] = {"res1": _res_block(sd, "encoder.mid.block_1"),
                  "attn": _attn_block(sd, "encoder.mid.attn_1"),
                  "res2": _res_block(sd, "encoder.mid.block_2")}
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    n_dec = len(cfg.decoder_ch_mult)
    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = {"res1": _res_block(sd, "decoder.mid.block_1"),
                  "attn": _attn_block(sd, "decoder.mid.attn_1"),
                  "res2": _res_block(sd, "decoder.mid.block_2")}
    dlevels = []
    for i in reversed(range(n_dec)):
        level = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            level["res"].append(level_block("decoder", i, j))
            if f"decoder.up.{i}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attn_block(sd, f"decoder.up.{i}.attn.{j}"))
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = {"conv": _conv(sd, f"decoder.up.{i}.upsample.conv")}
        dlevels.append(level)
    dec["levels"] = dlevels
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {"encoder": enc, "decoder": dec,
            "quantize": {"embedding": _np(sd["quantize.embedding.weight"]).astype(np.float32)},
            "quant_conv": _conv(sd, "quant_conv"),
            "post_quant_conv": _conv(sd, "post_quant_conv")}


# ---------------------------------------------------------------------------
# CausalVideoVAE
# ---------------------------------------------------------------------------

def _conv3d(sd, name_prefix) -> Dict[str, np.ndarray]:
    """torch Conv3d OIDHW -> DHWIO."""
    w = _np(sd[name_prefix + ".weight"]).transpose(2, 3, 4, 1, 0).astype(np.float32)
    b = _np(sd[name_prefix + ".bias"]).astype(np.float32)
    return {"kernel": w, "bias": b}


def _cconv(sd, prefix) -> Dict[str, np.ndarray]:
    """Reference CausalConv3d wraps an inner nn.Conv3d at '<prefix>.conv'."""
    return _conv3d(sd, prefix + ".conv")


def _res3d(sd, prefix) -> Dict[str, Any]:
    p = {
        "norm1": _gn(sd, prefix + ".norm1.norm")
        if prefix + ".norm1.norm.weight" in sd else _gn(sd, prefix + ".norm1"),
        "conv1": _cconv(sd, prefix + ".conv1"),
        "norm2": _gn(sd, prefix + ".norm2.norm")
        if prefix + ".norm2.norm.weight" in sd else _gn(sd, prefix + ".norm2"),
        "conv2": _cconv(sd, prefix + ".conv2"),
    }
    if prefix + ".nin_shortcut.conv.weight" in sd:
        p["nin_shortcut"] = _cconv(sd, prefix + ".nin_shortcut")
    return p


def _attn3d(sd, prefix) -> Dict[str, Any]:
    norm_key = (prefix + ".norm.norm") if prefix + ".norm.norm.weight" in sd \
        else (prefix + ".norm")
    return {"norm": _gn(sd, norm_key),
            "q": _cconv(sd, prefix + ".q"), "k": _cconv(sd, prefix + ".k"),
            "v": _cconv(sd, prefix + ".v"),
            "proj_out": _cconv(sd, prefix + ".proj_out")}


def import_causal_vae_state_dict(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Reference CausalVAEModel state dict -> our pytree (default topology:
    modeling_causalvae.py:265-320 — down.{i}.block/downsample/time_downsample,
    up.{i}.block/upsample/time_upsample, mid.block_1/attn_1/block_2)."""
    sd = unwrap_state_dict(sd)
    n_levels = len(cfg.ch_mult)
    sdl = tuple(range(n_levels - 1))

    enc: Dict[str, Any] = {"conv_in": _cconv(sd, "encoder.conv_in")}
    levels = []
    for i in range(n_levels):
        level: Dict[str, Any] = {"res": []}
        for j in range(cfg.num_res_blocks):
            level["res"].append(_res3d(sd, f"encoder.down.{i}.block.{j}"))
        if i in sdl:
            level["downsample"] = _cconv(sd, f"encoder.down.{i}.downsample.conv")
        levels.append(level)
    enc["levels"] = levels
    enc["mid"] = {"res1": _res3d(sd, "encoder.mid.block_1"),
                  "attn": _attn3d(sd, "encoder.mid.attn_1"),
                  "res2": _res3d(sd, "encoder.mid.block_2")}
    norm_out_key = "encoder.norm_out.norm" \
        if "encoder.norm_out.norm.weight" in sd else "encoder.norm_out"
    enc["norm_out"] = _gn(sd, norm_out_key)
    enc["conv_out"] = _cconv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _cconv(sd, "decoder.conv_in")}
    dec["mid"] = {"res1": _res3d(sd, "decoder.mid.block_1"),
                  "attn": _attn3d(sd, "decoder.mid.attn_1"),
                  "res2": _res3d(sd, "decoder.mid.block_2")}
    dlevels = []
    for i_level in reversed(range(n_levels)):
        level = {"res": [_res3d(sd, f"decoder.up.{i_level}.block.{j}")
                         for j in range(cfg.num_res_blocks + 1)]}
        if i_level != 0:
            level["upsample"] = _cconv(sd, f"decoder.up.{i_level}.upsample.conv")
        dlevels.append(level)
    dec["levels"] = dlevels
    dnorm_key = "decoder.norm_out.norm" \
        if "decoder.norm_out.norm.weight" in sd else "decoder.norm_out"
    dec["norm_out"] = _gn(sd, dnorm_key)
    dec["conv_out"] = _cconv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _cconv(sd, "quant_conv"),
        "post_quant_conv": _cconv(sd, "post_quant_conv"),
    }


def inflate_2d_to_3d(kernel2d: np.ndarray, kt: int = 3,
                     mode: str = "tail") -> np.ndarray:
    """Inflate a 2D conv kernel (H, W, I, O) to causal 3D (kt, H, W, I, O).

    Reference CausalVideoVAE/scripts/convert_weight.py seeds the 3D VAE from
    a 2D SD-VAE: the 2D kernel goes into the LAST temporal slice (so frame t
    initially only uses frame t — identity temporal behavior with causal
    padding); earlier slices start at zero.
    """
    out = np.zeros((kt,) + kernel2d.shape, kernel2d.dtype)
    if mode == "tail":
        out[-1] = kernel2d
    elif mode == "center":
        out[kt // 2] = kernel2d
    else:  # "average"
        out[:] = kernel2d[None] / kt
    return out
