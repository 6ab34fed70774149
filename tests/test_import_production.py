"""Weight-import parity at PRODUCTION shapes (VERDICT r1 next-step #4).

Round 1 proved the importers only at toy shapes (dim 64, 2 layers); key-fusion
or shape bugs at real shapes (GPT-L qkv fusion, VQ-16 ch_mult stack, CausalVAE
default topology, taming f16 attn placement) would surface only when real
checkpoints arrive. Here we build the FULL-SIZE reference models with random
init on CPU, import their state_dicts through core/torch_import.py, and pin
output parity. Inputs are kept small (weights, not activations, are what the
importers touch).

Slow: ~3-4 min total. Marked `slow` for selective filtering.
"""

import gc
import sys

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")


def _ref(reference_path, module):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import importlib
    return importlib.import_module(module)


def test_gpt_l_import_parity(reference_path):
    """GPT-L (343M, dim 1024, 24 layers): fused-qkv split + RoPE at scale.

    Matches the SURVEY §7.2 gate's model (c2i_L_256.pt shape)."""
    ref = _ref(reference_path, "autoregressive.models.gpt")
    torch.manual_seed(0)
    margs = ref.ModelArgs(dim=1024, n_layer=24, n_head=16, vocab_size=16384,
                          num_classes=1000, block_size=256, cls_token_num=1,
                          model_type="c2i", token_dropout_p=0.0,
                          resid_dropout_p=0.0, ffn_dropout_p=0.0)
    tm = ref.Transformer(margs).eval()
    with torch.no_grad():
        tm.output.weight.normal_(0, 0.02)

    from video_llamagen_tpu.core.config import gpt_config
    from video_llamagen_tpu.core.torch_import import import_gpt_state_dict
    from video_llamagen_tpu.models import gpt

    cfg = gpt_config("GPT-L", vocab_size=16384, block_size=256,
                     num_classes=1000, cls_token_num=1, model_type="c2i",
                     dtype="float32")
    params = import_gpt_state_dict(tm.state_dict(), cfg)

    rs = np.random.RandomState(0)
    b, n_img = 2, 32
    idx = rs.randint(0, 16384, (b, n_img - 1))
    cond = rs.randint(0, 1000, (b,))
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(idx), torch.from_numpy(cond),
                     input_pos=torch.arange(n_img))
    want = want.numpy()

    got, _ = gpt.forward(params, cfg, jnp.asarray(idx), jnp.asarray(cond),
                         train=False)
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)
    assert np.array_equal(got.argmax(-1), want.argmax(-1))
    del tm, params
    gc.collect()


def test_vq_16_import_parity(reference_path):
    """VQ-16 at full production config (ch 128, mult (1,1,2,2,4), 16384x8):
    bit-exact token indices + decode parity (the vq_ds16_c2i.pt shape,
    ref vq_model.py:418-420)."""
    ref = _ref(reference_path, "tokenizer.tokenizer_image.vq_model")
    torch.manual_seed(0)
    tm = ref.VQ_16(codebook_size=16384, codebook_embed_dim=8).eval()

    from video_llamagen_tpu.core.config import vq_config
    from video_llamagen_tpu.core.torch_import import import_vq_state_dict
    from video_llamagen_tpu.tokenizers.vq import model as vq

    cfg = vq_config("VQ-16", codebook_size=16384, codebook_embed_dim=8,
                    dtype="float32")
    params = import_vq_state_dict(tm.state_dict(), cfg)

    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want_dec, _ = tm(torch.from_numpy(x))
        _, _, (_, _, want_idx) = tm.encode(torch.from_numpy(x))

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    _, _, got_idx = vq.encode(params, cfg, xj)
    got_dec, _, _ = vq.forward(params, cfg, xj)

    np.testing.assert_array_equal(np.asarray(got_idx),
                                  want_idx.numpy().reshape(-1))
    # PSNR>50 gate vs the reference decode (SURVEY §7.2)
    err = np.asarray(got_dec).transpose(0, 3, 1, 2) - want_dec.numpy()
    psnr = 10 * np.log10(4.0 / max(float((err ** 2).mean()), 1e-12))
    assert psnr > 50, psnr
    del tm, params
    gc.collect()


def test_taming_vqgan_f16_import_parity(reference_path):
    """taming VQGAN imagenet_f16_16384 at full shape (attn at res 16, no-l2
    codebook 16384x256, decoder n_res+1): token + decode parity
    (ref tokenizer/vqgan/configs/vqgan_imagenet_f16_16384.yaml)."""
    ref = _ref(reference_path, "tokenizer.vqgan.model")
    ddconfig = dict(double_z=False, z_channels=256, resolution=256,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 1, 2, 2, 4],
                    num_res_blocks=2, attn_resolutions=[16], dropout=0.0)
    torch.manual_seed(0)
    tm = ref.VQModel(ddconfig, n_embed=16384, embed_dim=256).eval()

    from video_llamagen_tpu.core.config import VQConfig
    from video_llamagen_tpu.core.torch_import import import_taming_vqgan_state_dict
    from video_llamagen_tpu.tokenizers.vq import model as vq

    cfg = VQConfig(codebook_size=16384, codebook_embed_dim=256,
                   codebook_l2_norm=False,
                   encoder_ch_mult=(1, 1, 2, 2, 4),
                   decoder_ch_mult=(1, 1, 2, 2, 4),
                   z_channels=256, ch=128, dtype="float32")
    params = import_taming_vqgan_state_dict(tm.state_dict(), cfg)

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    with torch.no_grad():
        quant, _, (_, _, want_idx) = tm.encode(torch.from_numpy(x))
        want_dec = tm.decode(quant)

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    _, _, got_idx = vq.encode(params, cfg, xj)
    got_dec, _, _ = vq.forward(params, cfg, xj)

    np.testing.assert_array_equal(np.asarray(got_idx),
                                  want_idx.numpy().reshape(-1))
    err = np.asarray(got_dec).transpose(0, 3, 1, 2) - want_dec.numpy()
    psnr = 10 * np.log10(4.0 / max(float((err ** 2).mean()), 1e-12))
    assert psnr > 50, psnr
    del tm, params
    gc.collect()


def test_causal_vae_import_parity_full(reference_path):
    """CausalVAEModel at its DEFAULT production topology (hidden 128, mult
    (1,2,4,4), temporal down at levels 1,2 -> 4x8x8 compression): encode-mode
    + decode parity via the whole-model import path, incl. the
    ema_state_dict-preference branch (modeling_causalvae.py:578-601)."""
    from ref_stubs import import_causalvideovae
    mod = import_causalvideovae(reference_path)
    torch.manual_seed(0)
    tm = mod.CausalVAEModel().eval()  # all defaults = production config

    from video_llamagen_tpu.core.config import CausalVAEConfig
    from video_llamagen_tpu.core.torch_import import (
        import_causal_vae_state_dict, unwrap_state_dict)
    from video_llamagen_tpu.tokenizers.causal_vae import model as cv

    cfg = CausalVAEConfig(dtype="float32")
    sd = tm.state_dict()
    params = import_causal_vae_state_dict(sd, cfg)

    x = np.random.RandomState(2).rand(1, 3, 9, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        post = tm.encode(torch.from_numpy(x))
        z = post.mode()
        want_dec = tm.decode(z).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    got_post = cv.encode(params, cfg, xj)
    np.testing.assert_allclose(
        np.asarray(got_post.mean).transpose(0, 4, 1, 2, 3),
        z.numpy(), atol=1e-3, rtol=1e-3)
    got_dec = cv.decode(params, cfg, jnp.asarray(z.numpy().transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got_dec).transpose(0, 4, 1, 2, 3),
                               want_dec, atol=5e-3, rtol=1e-2)

    # ema_state_dict preference: wrap a perturbed copy as "ema_state_dict" and
    # check the unwrapper picks it over "state_dict"
    sd_pert = {k: v + 1.0 for k, v in sd.items()}
    picked = unwrap_state_dict({"state_dict": sd, "ema_state_dict": sd_pert})
    some_key = next(iter(sd))
    assert torch.allclose(picked[some_key], sd_pert[some_key])
    del tm, params
    gc.collect()
