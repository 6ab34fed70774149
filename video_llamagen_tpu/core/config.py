"""Typed configuration tree for the whole framework.

Replaces the reference's per-entry-point argparse surfaces + factory dicts
(reference: autoregressive/models/gpt.py:23-50 ModelArgs and gpt.py:441-470 zoo,
tokenizer/tokenizer_image/vq_model.py:12-25) with frozen dataclasses that are
hashable, so they can be closed over by jitted functions as static data.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def find_multiple(n: int, k: int) -> int:
    """Round n up to a multiple of k (reference: gpt.py:18-21)."""
    if n % k == 0:
        return n
    return n + k - (n % k)


@dataclass(frozen=True)
class GPTConfig:
    """AR transformer configuration.

    Mirrors the capability surface of reference gpt.py:23-50 / gpt_video_diff.py
    but with TPU-relevant extras (dtype policy, remat).
    """

    dim: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_kv_head: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    initializer_range: float = 0.02

    token_dropout_p: float = 0.1
    attn_dropout_p: float = 0.0
    resid_dropout_p: float = 0.1
    ffn_dropout_p: float = 0.1
    drop_path_rate: float = 0.0

    num_classes: int = 1000
    caption_dim: int = 2048
    class_dropout_prob: float = 0.1
    model_type: str = "c2i"  # c2i | t2i | t2v

    vocab_size: int = 16384
    cls_token_num: int = 1
    block_size: int = 256  # number of image tokens (grid_size**2)

    # --- video (t2v) extensions (reference gpt_video*.py) ---
    vae_embed_dim: int = 4          # channel dim of CausalVAE latents
    num_frames: int = 17
    t_downsample_size: int = 4
    # diffusion head (reference gpt_video_diff.py:74-83)
    diffloss_d: int = 3
    diffloss_w: int = 1024
    num_sampling_steps: str = "100"
    diffusion_batch_mul: int = 4
    grad_checkpointing: bool = False
    mask_ratio_min: float = 0.7     # masked-training variant
    # head selection for the video trunk: "mse" | "diff" | "mask_diff"
    video_head: str = "diff"

    # --- TPU execution policy ---
    dtype: str = "bfloat16"          # activation/compute dtype
    param_dtype: str = "float32"     # master parameter dtype
    remat: bool = False              # jax.checkpoint each block in training

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_head

    @property
    def kv_heads(self) -> int:
        return self.n_kv_head if self.n_kv_head is not None else self.n_head

    @property
    def ffn_hidden(self) -> int:
        """SwiGLU hidden size (reference gpt.py:153-158)."""
        hidden = int(2 * (4 * self.dim) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        return find_multiple(hidden, self.multiple_of)

    @property
    def grid_size(self) -> int:
        g = int(round(self.block_size ** 0.5))
        assert g * g == self.block_size, "block_size must be a perfect square"
        return g

    @property
    def vae_t(self) -> int:
        """Number of latent frames (reference gpt_video.py latent time length)."""
        return (self.num_frames - 1) // self.t_downsample_size + 1

    def replace(self, **kw) -> "GPTConfig":
        return dataclasses.replace(self, **kw)


# Model zoo — sizes match reference gpt.py:441-470 exactly; GPT-nano is an
# addition for CPU smoke tests and CI.
GPT_CONFIGS = {
    "GPT-nano": dict(n_layer=2, n_head=4, dim=128),
    "GPT-B":    dict(n_layer=12, n_head=12, dim=768),     # 111M
    "GPT-L":    dict(n_layer=24, n_head=16, dim=1024),    # 343M
    "GPT-XL":   dict(n_layer=36, n_head=20, dim=1280),    # 775M
    "GPT-XXL":  dict(n_layer=48, n_head=24, dim=1536),    # 1.4B
    "GPT-XXXL": dict(n_layer=48, n_head=40, dim=2560),    # 3.9B
    "GPT-1B":   dict(n_layer=22, n_head=32, dim=2048),    # 1.2B
    "GPT-3B":   dict(n_layer=24, n_head=32, dim=3200),    # 3.1B
    "GPT-7B":   dict(n_layer=32, n_head=32, dim=4096),    # 6.6B
}


def gpt_config(name: str, **kwargs) -> GPTConfig:
    """Factory matching reference `GPT_models[name](**kwargs)` (gpt.py:467-470)."""
    base = dict(GPT_CONFIGS[name])
    base.update(kwargs)
    return GPTConfig(**base)


@dataclass(frozen=True)
class VQConfig:
    """VQ-VAE image tokenizer config (reference vq_model.py:12-25, 418-424)."""

    codebook_size: int = 16384
    codebook_embed_dim: int = 8
    codebook_l2_norm: bool = True
    codebook_show_usage: bool = True
    commit_loss_beta: float = 0.25
    entropy_loss_ratio: float = 0.0
    encoder_ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    decoder_ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    z_channels: int = 256
    dropout_p: float = 0.0
    ch: int = 128
    num_res_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    # rematerialize each resnet/attn block in backward (trades ~1.3x compute
    # for activation memory; without it batch 32 @256 OOMs the 16G chip)
    remat: bool = False

    dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.encoder_ch_mult) - 1)

    def replace(self, **kw) -> "VQConfig":
        return dataclasses.replace(self, **kw)


VQ_CONFIGS = {
    "VQ-16": dict(encoder_ch_mult=(1, 1, 2, 2, 4), decoder_ch_mult=(1, 1, 2, 2, 4)),
    "VQ-8":  dict(encoder_ch_mult=(1, 2, 2, 4), decoder_ch_mult=(1, 2, 2, 4)),
}


def vq_config(name: str, **kwargs) -> VQConfig:
    base = dict(VQ_CONFIGS[name])
    base.update(kwargs)
    return VQConfig(**base)


@dataclass(frozen=True)
class CausalVAEConfig:
    """Causal 3D video VAE config.

    Mirrors CausalVideoVAE/causalvideovae/model/causal_vae/modeling_causalvae.py
    defaults: 4x temporal, 8x spatial compression, z_channels=4.
    """

    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 4
    hidden_size: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    double_z: bool = True
    embed_dim: int = 4
    # which levels get temporal down/up sampling (2 of 3 transitions → 4x)
    time_downsample_levels: Tuple[int, ...] = (1, 2)
    use_attention: bool = True
    # rematerialize enc/dec blocks in backward (3D-conv activations at
    # 17f@256 dominate HBM; same lever as VQConfig.remat)
    remat: bool = False

    # tiling (reference modeling_causalvae.py:444-570)
    tile_sample_min_t: int = 17      # frames per temporal tile
    tile_sample_min_size: int = 256  # spatial tile (pixels)
    tile_overlap_factor: float = 0.25

    dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @property
    def time_compress(self) -> int:
        return 2 ** len(self.time_downsample_levels)

    @property
    def spatial_compress(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    def replace(self, **kw) -> "CausalVAEConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh. axes: data (pure DP), fsdp (sharded DP), tp, cp,
    pp (pipeline stages — parallel/pp.py rotation schedule).

    The reference's NCCL DDP/FSDP/TP/PP surface (SURVEY.md §2.9; vLLM's
    ensure_model_parallel_initialized(tensor_parallel_size,
    pipeline_parallel_size), ref serve/worker.py:282-320) maps onto these
    axes; XLA inserts the collectives.
    """

    data: int = 1
    fsdp: int = 1
    tp: int = 1
    cp: int = 1
    pp: int = 1

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "fsdp", "tp", "cp", "pp")

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.fsdp, self.tp, self.cp, self.pp)

    @property
    def num_devices(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference train_t2v.py:409-471 flag surface)."""

    lr: float = 1e-4
    weight_decay: float = 5e-2
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    epochs: int = 300
    global_batch_size: int = 256
    global_seed: int = 0
    ema: bool = False
    ema_decay: float = 0.9999
    log_every: int = 100
    ckpt_every: int = 5000
    gradient_accumulation_steps: int = 1
    mixed_precision: str = "bf16"
