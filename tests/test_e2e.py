"""End-to-end pipeline smokes: model -> tokenizer -> pixels.

SURVEY.md §4's "end-to-end c2i CPU smoke" plus the t2i and t2v analogs:
chain the AR model's token/latent generation into the matching tokenizer
decoder and check the final pixel tensors, exercising every seam the unit
tests cover in isolation (ref README.md c2i flow; sample_t2i.py:24-180;
sample_t2v_1f_diff.py:10-11 + vae decode reshape at sample_t2v_1f.py:196-225).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.core.config import (CausalVAEConfig, GPTConfig,
                                            VQConfig, gpt_config)
from video_llamagen_tpu.models import gpt, gpt_video
from video_llamagen_tpu.inference import generate_video
from video_llamagen_tpu.inference.generate import generate
from video_llamagen_tpu.tokenizers.causal_vae import model as cv
from video_llamagen_tpu.tokenizers.vq import model as vq

VQ_TINY = VQConfig(ch=16, z_channels=16, codebook_size=64,
                   codebook_embed_dim=8, encoder_ch_mult=(1, 2),
                   decoder_ch_mult=(1, 2), num_res_blocks=1, dtype="float32")
# VQ_TINY has 2 levels -> downsample 2x: 16 tokens decode to 8x8 pixels


def test_c2i_pipeline():
    """class label -> GPT tokens -> VQ decode_code -> image."""
    cfg = gpt_config("GPT-nano", vocab_size=VQ_TINY.codebook_size,
                     block_size=16, num_classes=10, cls_token_num=1,
                     model_type="c2i", dtype="float32")
    gparams = gpt.init_gpt_params(jax.random.key(0), cfg)
    vparams = vq.init_vq_params(jax.random.key(1), VQ_TINY)

    cond = jnp.asarray([3, 7], jnp.int32)
    toks = generate(gparams, cfg, cond, jax.random.key(2), 16, cfg_scale=1.5,
                    top_k=16)
    assert toks.shape == (2, 16)
    assert int(toks.max()) < VQ_TINY.codebook_size and int(toks.min()) >= 0

    imgs = vq.decode_code(vparams, VQ_TINY, toks, latent_hw=(4, 4))
    assert imgs.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(imgs)))


def test_t2i_pipeline():
    """T5 features (+pad mask) -> GPT tokens -> VQ decode_code -> image."""
    cfg = gpt_config("GPT-nano", vocab_size=VQ_TINY.codebook_size,
                     block_size=16, cls_token_num=6, caption_dim=12,
                     model_type="t2i", dtype="float32")
    gparams = gpt.init_gpt_params(jax.random.key(0), cfg)
    vparams = vq.init_vq_params(jax.random.key(1), VQ_TINY)

    cond = jax.random.normal(jax.random.key(2), (2, 6, 12)) * 0.1
    emb_masks = jnp.asarray([[0, 0, 1, 1, 1, 1],      # left-padded T5 contract
                             [0, 0, 0, 1, 1, 1]], bool)
    toks = generate(gparams, cfg, cond, jax.random.key(3), 16,
                    emb_masks=emb_masks, cfg_scale=1.5, top_k=16)
    imgs = vq.decode_code(vparams, VQ_TINY, toks, latent_hw=(4, 4))
    assert imgs.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(imgs)))


@pytest.mark.parametrize("head", ["diff", "mse"])
def test_t2v_pipeline(head):
    """T5 features -> video GPT latents -> CausalVAE decode -> video."""
    vae_cfg = CausalVAEConfig(hidden_size=8, z_channels=2, embed_dim=2,
                              ch_mult=(1, 2), num_res_blocks=1,
                              time_downsample_levels=(0,),
                              tile_sample_min_t=5, dtype="float32")
    # latent grid: t=2 (3 frames / 2x), h=w=2 -> seq 8; latent ch = embed_dim
    gcfg = GPTConfig(dim=32, n_layer=2, n_head=2, vocab_size=64,
                     caption_dim=16, cls_token_num=3, block_size=4,
                     model_type="t2v", vae_embed_dim=2, num_frames=3,
                     t_downsample_size=2, diffloss_d=1, diffloss_w=16,
                     num_sampling_steps="2", diffusion_batch_mul=2,
                     video_head=head, dtype="float32")
    gparams = gpt_video.init_video_gpt_params(jax.random.key(0), gcfg)
    vparams = cv.init_causal_vae_params(jax.random.key(1), vae_cfg)

    cond = jax.random.normal(jax.random.key(2), (1, 3, 16)) * 0.1
    if head == "diff":
        lat = generate_video.generate_ar(gparams, gcfg, cond,
                                         jax.random.key(3), cfg_scale=1.5)
    else:
        lat = generate_video.generate_ar_mse(gparams, gcfg, cond)
    seq = gpt_video.seq_len_video(gcfg)
    assert lat.shape == (1, seq, 2)

    # (B, t*h*w, C) -> (B, t, h, w, C) -> decode to pixels
    # (ref sample_t2v_1f.py:196-225 reshape contract)
    t = (gcfg.num_frames - 1) // gcfg.t_downsample_size + 1
    g = int(np.sqrt(seq // t))
    z = lat.reshape(1, t, g, g, 2)
    vid = cv.decode(vparams, vae_cfg, z)
    assert vid.shape[0] == 1 and vid.shape[-1] == 3
    assert vid.shape[1] == gcfg.num_frames          # causal: t=2 -> 3 frames
    assert np.all(np.isfinite(np.asarray(vid)))


def test_train_c2i_cli_smoke_and_resume(tmp_path):
    """The training CLI end-to-end on synthetic codes: runs steps, writes a
    checkpoint, and --resume restores and continues from it (ref
    vq_train.py:141-158 / train_t2v.py:225-234 resume arithmetic)."""
    from video_llamagen_tpu.train.train_c2i import main

    args = ["--gpt-model", "GPT-nano", "--image-size", "64",
            "--downsample-size", "16", "--vocab-size", "128",
            "--num-classes", "8", "--global-batch-size", "8",
            "--max-steps", "2", "--ckpt-every", "2", "--log-every", "1",
            "--mixed-precision", "none", "--results-dir", str(tmp_path)]
    state = main(args)
    assert int(state.step) == 2

    # fresh invocation resumes from the step-2 checkpoint and continues
    state2 = main(args + ["--resume", "--max-steps", "4"])
    assert int(state2.step) == 4


def test_sample_npz_cli(tmp_path):
    """FID sampling flow: sample_npz CLI -> ADM npz -> evaluator math."""
    from video_llamagen_tpu.inference.sample_npz import main
    out = str(tmp_path / "s.npz")
    main(["--gpt-model", "GPT-nano", "--image-size", "64",
          "--downsample-size", "16", "--num-classes", "4",
          "--num-samples", "6", "--per-batch", "4", "--out", out,
          "--save-labels"])
    d = np.load(out)
    assert d["arr_0"].shape == (6, 64, 64, 3) and d["arr_0"].dtype == np.uint8
    assert set(d["arr_1"]) <= set(range(4))


def test_evaluator_activation_cache(tmp_path):
    """evaluator.main caches per-npz activations (<npz>.acts-<key>.npz) and a
    cached rerun reproduces the metrics bit-for-bit — reruns against the same
    reference batch skip the on-chip Inception recompute."""
    import glob

    from video_llamagen_tpu.evals.evaluator import main

    rs = np.random.RandomState(0)
    ref = str(tmp_path / "ref.npz")
    smp = str(tmp_path / "smp.npz")
    np.savez(ref, arr_0=rs.randint(0, 256, (6, 32, 32, 3), dtype=np.uint8))
    np.savez(smp, arr_0=rs.randint(0, 256, (6, 32, 32, 3), dtype=np.uint8))

    first = main([ref, smp, "--batch", "4"])
    caches = glob.glob(str(tmp_path / "*.acts-*.npz"))
    assert len(caches) == 2, caches
    second = main([ref, smp, "--batch", "4"])
    assert first.keys() == second.keys()
    for k in first:
        np.testing.assert_array_equal(first[k], second[k])

    # a different limit must key a different cache entry, not reuse stale acts
    main([ref, smp, "--batch", "4", "--limit", "4"])
    assert len(glob.glob(str(tmp_path / "*.acts-*.npz"))) == 4
