"""Golden parity: our JAX GPT vs the torch reference, same weights.

Builds a tiny reference Transformer (autoregressive/models/gpt.py), imports
its state_dict through core/torch_import.py, and checks logits match. This
validates RoPE application, fused-QKV split order, SwiGLU, RMSNorm, the
zero-prefix freqs table, and the cls-token logit truncation in one shot.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from video_llamagen_tpu.core.config import GPTConfig
from video_llamagen_tpu.core.torch_import import import_gpt_state_dict
from video_llamagen_tpu.models import gpt


def _ref_gpt(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import importlib
    return importlib.import_module("autoregressive.models.gpt")


@pytest.mark.parametrize("model_type,cls_token_num", [("c2i", 1), ("t2i", 6)])
def test_gpt_forward_parity(reference_path, model_type, cls_token_num):
    import torch
    ref = _ref_gpt(reference_path)

    torch.manual_seed(0)
    margs = ref.ModelArgs(dim=64, n_layer=2, n_head=4, vocab_size=97,
                          num_classes=10, caption_dim=32, block_size=16,
                          cls_token_num=cls_token_num, model_type=model_type,
                          token_dropout_p=0.0, resid_dropout_p=0.0,
                          ffn_dropout_p=0.0, class_dropout_prob=0.1)
    tm = ref.Transformer(margs).eval()
    # zero-init head would make all logits 0 — give it signal
    with torch.no_grad():
        tm.output.weight.normal_(0, 0.02)

    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=97, num_classes=10,
                    caption_dim=32, block_size=16, cls_token_num=cls_token_num,
                    model_type=model_type, dtype="float32")
    params = import_gpt_state_dict(tm.state_dict(), cfg)

    rs = np.random.RandomState(0)
    b, n_img = 2, 16
    idx = rs.randint(0, 97, (b, n_img - 1))
    if model_type == "c2i":
        cond_t = torch.from_numpy(rs.randint(0, 10, (b,)))
        cond_j = jnp.asarray(cond_t.numpy())
    else:
        cond_np = rs.randn(b, cls_token_num, 32).astype(np.float32)
        cond_t = torch.from_numpy(cond_np)
        cond_j = jnp.asarray(cond_np)

    seq_len = cls_token_num + n_img - 1
    input_pos = torch.arange(seq_len)
    with torch.no_grad():
        ref_logits, _ = tm(torch.from_numpy(idx), cond_t, input_pos=input_pos)
    ref_logits = ref_logits.numpy()

    our_logits, _ = gpt.forward(params, cfg, jnp.asarray(idx), cond_j, train=False)
    # ours is truncated to [cls_token_num-1:], reference (eval mode) is full
    want = ref_logits[:, cls_token_num - 1:]
    np.testing.assert_allclose(np.asarray(our_logits), want, atol=2e-3, rtol=1e-3)


def test_vq_model_forward_parity(reference_path):
    """Tiny reference VQModel -> import weights -> encode/decode match."""
    import torch
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import importlib
    ref = importlib.import_module("tokenizer.tokenizer_image.vq_model")

    from video_llamagen_tpu.core.config import VQConfig
    from video_llamagen_tpu.core.torch_import import import_vq_state_dict
    from video_llamagen_tpu.tokenizers.vq import model as vq

    torch.manual_seed(0)
    margs = ref.ModelArgs(codebook_size=32, codebook_embed_dim=8,
                          encoder_ch_mult=[1, 2], decoder_ch_mult=[1, 2],
                          z_channels=16)
    # reference Encoder/Decoder take ch from default (128): build with ch=32
    tm = ref.VQModel(margs)
    tm.encoder = ref.Encoder(ch=32, ch_mult=(1, 2), num_res_blocks=2,
                             z_channels=16)
    tm.decoder = ref.Decoder(ch=32, ch_mult=(1, 2), num_res_blocks=2,
                             z_channels=16)
    tm = tm.eval()

    cfg = VQConfig(codebook_size=32, codebook_embed_dim=8,
                   encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2),
                   z_channels=16, ch=32, dtype="float32")
    params = import_vq_state_dict(tm.state_dict(), cfg)

    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want_dec, _ = tm(torch.from_numpy(x))
        want_q, _, (_, _, want_idx) = tm.encode(torch.from_numpy(x))

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_q, _, got_idx = vq.encode(params, cfg, xj)
    got_dec, _, _ = vq.forward(params, cfg, xj)

    np.testing.assert_array_equal(np.asarray(got_idx),
                                  want_idx.numpy().reshape(-1))
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 3, 1, 2), want_dec.numpy(),
        atol=2e-3, rtol=1e-3)
