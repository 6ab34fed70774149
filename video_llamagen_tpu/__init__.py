"""video_llamagen_tpu — a TPU-native (JAX/XLA/Pallas) video+image autoregressive
generation framework with the capabilities of Video-LlamaGen.

Subpackages
-----------
core        configs, mesh/sharding helpers, RoPE tables, RNG, checkpointing
ops         Pallas/XLA kernels: VQ nearest-neighbor, fused decode attention, sampling
models      AR transformers (image GPT c2i/t2i, video GPT with MSE/diffusion/mask heads)
tokenizers  VQ-VAE image tokenizer, causal 3D video VAE
diffusion   IDDPM machinery backing the MAR-style diffusion head
parallel    mesh construction + parameter/activation sharding rules (dp/fsdp/tp/cp)
train       pjit training loops (c2i, t2i, t2v, VQ GAN)
inference   compiled KV-cached decode loops (image + video)
serve       continuous-batching serving engine
text        T5 conditioning (caption cleaning, feature extraction)
data        datasets + video transforms
evals       FID/PSNR/SSIM/FVD + Pallas correlation kernel
"""

__version__ = "0.1.0"
