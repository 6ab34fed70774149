"""FLOPs / parameter / memory estimators (ref CausalVideoVAE/scripts/cal_expense.py).

Static analytical estimates for the GPT trunks and the CausalVAE — used for
capacity planning (per-step compute, KV-cache and activation memory) without
running anything.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

from ..core.config import CausalVAEConfig, GPTConfig


@dataclass
class CostReport:
    params: int
    flops_per_token: float
    flops_forward: float
    kv_cache_bytes: int
    notes: str = ""

    def as_dict(self) -> Dict:
        return {
            "params_M": round(self.params / 1e6, 1),
            "gflops_per_token": round(self.flops_per_token / 1e9, 2),
            "tflops_forward": round(self.flops_forward / 1e12, 3),
            "kv_cache_MB": round(self.kv_cache_bytes / 2 ** 20, 1),
            "notes": self.notes,
        }


def gpt_cost(cfg: GPTConfig, batch: int = 1, seq: int | None = None,
             kv_dtype_bytes: int = 2) -> CostReport:
    """Decoder-only transformer cost. flops_per_token ≈ 2 * params (weights)
    + attention term 2*2*dim*seq."""
    seq = seq or (cfg.cls_token_num + cfg.block_size)
    h = cfg.ffn_hidden
    per_layer = (cfg.dim * (cfg.n_head + 2 * cfg.kv_heads) * cfg.head_dim  # qkv
                 + cfg.dim * cfg.dim                                        # wo
                 + 3 * cfg.dim * h)                                         # ffn
    params = (cfg.n_layer * per_layer + 2 * cfg.vocab_size * cfg.dim
              + cfg.n_layer * 2 * cfg.dim + cfg.dim)
    flops_tok = 2 * params + cfg.n_layer * 4 * cfg.dim * seq
    kv = (cfg.n_layer * 2 * batch * seq * cfg.kv_heads * cfg.head_dim
          * kv_dtype_bytes)
    return CostReport(params=params, flops_per_token=flops_tok,
                      flops_forward=flops_tok * batch * seq,
                      kv_cache_bytes=kv,
                      notes=f"seq={seq} batch={batch}")


def causal_vae_cost(cfg: CausalVAEConfig, frames: int = 17,
                    height: int = 256, width: int = 256) -> CostReport:
    """Rough conv-FLOPs for one encode pass (3x3x3 convs dominate)."""
    ch = cfg.hidden_size
    total_flops = 0.0
    params = 0
    t, h, w = frames, height, width
    cin = cfg.in_channels
    sd = set(range(len(cfg.ch_mult) - 1))
    for i, mult in enumerate(cfg.ch_mult):
        cout = ch * mult
        # num_res_blocks x two 3^3 convs per block (+ in conv at level 0)
        convs = 2 * cfg.num_res_blocks + (1 if i == 0 else 0)
        k = 27
        flop_per_conv = 2 * k * cin * cout * t * h * w
        total_flops += convs * flop_per_conv
        params += convs * k * cin * cout
        cin = cout
        if i in sd:
            h, w = h // 2, w // 2
        if i in cfg.time_downsample_levels:
            t = (t - 1) // 2 + 1
    return CostReport(params=params, flops_per_token=0.0,
                      flops_forward=total_flops, kv_cache_bytes=0,
                      notes=f"encode {frames}x{height}x{width} (approx)")
