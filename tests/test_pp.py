"""Pipeline parallelism (parallel/pp.py): GPipe rotation schedule parity.

The pipelined forward must reproduce models/gpt.forward exactly (same layer
composition, just scheduled across stages), gradients must match, and a full
pp x data train step must run sharded on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import randomize_head
from video_llamagen_tpu.core.config import GPTConfig, MeshConfig, TrainConfig
from video_llamagen_tpu.models import gpt
from video_llamagen_tpu.parallel import pp, mesh as pmesh
from video_llamagen_tpu.train.train_state import (
    create_train_state, make_train_step, train_state_shardings)


def _cfg(**kw):
    base = dict(dim=64, n_layer=4, n_head=4, vocab_size=128, num_classes=8,
                block_size=16, cls_token_num=1, model_type="c2i",
                dtype="float32")
    base.update(kw)
    return GPTConfig(**base)


def _data(cfg, b=4):
    idx = jax.random.randint(jax.random.key(1), (b, cfg.block_size - 1), 0,
                             cfg.vocab_size)
    cond = jax.random.randint(jax.random.key(2), (b,), 0, cfg.num_classes)
    targets = jax.random.randint(jax.random.key(3), (b, cfg.block_size), 0,
                                 cfg.vocab_size)
    return idx, cond, targets


def test_pipeline_forward_matches_forward_no_mesh():
    cfg = _cfg()
    # randomize_head: zero-init output head would make the logits/loss
    # comparisons vacuous (CLAUDE.md: 0 == 0 for any trunk)
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg))
    idx, cond, targets = _data(cfg)
    ref_logits, ref_loss = jax.jit(
        lambda p: gpt.forward(p, cfg, idx, cond, targets=targets))(params)
    for stages, mbs in [(1, 1), (2, 2), (4, 2), (2, 4)]:
        pl, ploss = jax.jit(
            lambda p, s=stages, m=mbs: pp.pipeline_forward(
                p, cfg, idx, cond, targets=targets,
                num_stages=s, num_microbatches=m))(params)
        np.testing.assert_allclose(np.asarray(pl), np.asarray(ref_logits),
                                   atol=1e-5)
        np.testing.assert_allclose(float(ploss), float(ref_loss), atol=1e-6)


def test_pipeline_forward_sharded_and_grads():
    cfg = _cfg()
    # randomize_head: with the zero head, logits are 0 == 0 and trunk grads
    # vanish (dL/dh = dlogits @ W_out^T = 0) — only a non-zero head makes
    # the rotation schedule observable in both comparisons
    params = randomize_head(gpt.init_gpt_params(jax.random.key(0), cfg))
    idx, cond, targets = _data(cfg)
    mesh = pmesh.make_mesh(MeshConfig(data=2, pp=4))
    psh = pp.pp_param_shardings(params, mesh)
    params_s = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                      params, psh)

    ref_logits, ref_loss = jax.jit(
        lambda p: gpt.forward(p, cfg, idx, cond, targets=targets))(params)
    pl, ploss = jax.jit(
        lambda p: pp.pipeline_forward(p, cfg, idx, cond, targets=targets,
                                      num_stages=4, num_microbatches=2,
                                      mesh=mesh))(params_s)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(ref_logits),
                               atol=1e-5)

    gref = jax.jit(jax.grad(
        lambda p: gpt.forward(p, cfg, idx, cond, targets=targets)[1]))(params)
    gpp = jax.jit(jax.grad(
        lambda p: pp.pipeline_forward(p, cfg, idx, cond, targets=targets,
                                      num_stages=4, num_microbatches=2,
                                      mesh=mesh)[1]))(params_s)
    for a, b in zip(jax.tree_util.tree_leaves(gref),
                    jax.tree_util.tree_leaves(gpp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_rotation_uses_collective_permute():
    """The stage hand-off must lower to collective-permute (ring on ICI),
    never an all-gather of the activation buffer."""
    cfg = _cfg()
    params = gpt.init_gpt_params(jax.random.key(0), cfg)
    idx, cond, targets = _data(cfg)
    mesh = pmesh.make_mesh(MeshConfig(data=2, pp=4))
    psh = pp.pp_param_shardings(params, mesh)
    params_s = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                      params, psh)
    f = jax.jit(lambda p: pp.pipeline_forward(
        p, cfg, idx, cond, targets=targets,
        num_stages=4, num_microbatches=2, mesh=mesh)[1])
    txt = f.lower(params_s).compile().as_text()
    assert txt.count("collective-permute") > 0
    assert txt.count("all-gather") == 0


def test_pp_train_step_runs_and_matches_dp():
    """Full pp train step: loss equals the dp-only step's loss for identical
    init/batch/rng. Block-level dropout is zeroed: inside the pipeline it
    draws (mb,S,D)-shaped masks per microbatch, so with p>0 the masks (not
    the math) differ from the full-batch baseline."""
    cfg = _cfg(token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0,
               class_dropout_prob=0.0)
    tcfg = TrainConfig(lr=1e-3, ema=False)
    b = 8
    batch = {
        "idx": jnp.zeros((b, cfg.block_size - 1), jnp.int32),
        "cond": jnp.zeros((b,), jnp.int32),
        "targets": jnp.zeros((b, cfg.block_size), jnp.int32),
    }

    # dp-only baseline (randomize_head in BOTH states: a zero output head
    # makes the loss trunk-independent — CE of all-zero logits = log V —
    # so the loss/params comparisons would pass for any broken schedule)
    mesh0 = pmesh.make_mesh(MeshConfig(data=8))
    s0 = create_train_state(jax.random.key(0), cfg, tcfg)
    s0 = s0._replace(params=randomize_head(s0.params))
    sh0 = train_state_shardings(s0, mesh0)
    s0 = jax.tree_util.tree_map(jax.device_put, s0, sh0)
    step0 = make_train_step(cfg, tcfg, mesh0, sh0)
    b0 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.data_sharding(mesh0, x.ndim)), batch)
    s0, m0 = step0(s0, b0, jax.random.key(1))

    # pp x data
    mesh1 = pmesh.make_mesh(MeshConfig(data=2, pp=4))
    s1 = create_train_state(jax.random.key(0), cfg, tcfg)
    s1 = s1._replace(params=randomize_head(s1.params))
    sh1 = train_state_shardings(s1, mesh1, pp=True)
    s1 = jax.tree_util.tree_map(jax.device_put, s1, sh1)
    step1 = make_train_step(cfg, tcfg, mesh1, sh1, pp=4, microbatches=2)
    b1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.data_sharding(mesh1, x.ndim)), batch)
    s1, m1 = step1(s1, b1, jax.random.key(1))

    assert np.isfinite(float(m1["loss"]))
    # class-dropout + token-dropout draw from the same keys in both paths on
    # the full batch, so the losses must agree
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), atol=1e-5)
    # params after one update agree too (same grads, same optimizer)
    for a, c in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_pp_video_trunk_matches_scan():
    """gpt_video.forward_train(pp_ctx=...) must reproduce the scan trunk for
    every head (same rng keys; dropout off so microbatch-shaped draws can't
    differ)."""
    from video_llamagen_tpu.models import gpt_video
    cfg = GPTConfig(dim=64, n_layer=4, n_head=4, vocab_size=128,
                    block_size=16, cls_token_num=4, model_type="t2v",
                    caption_dim=32, vae_embed_dim=4, num_frames=5,
                    t_downsample_size=4, diffusion_batch_mul=1,
                    dtype="float32", token_dropout_p=0.0,
                    resid_dropout_p=0.0, ffn_dropout_p=0.0,
                    class_dropout_prob=0.0)
    b = 4
    seq = cfg.grid_size ** 2 * cfg.vae_t
    latents = jax.random.normal(jax.random.key(1), (b, seq, cfg.vae_embed_dim))
    cond = jax.random.normal(jax.random.key(2), (b, cfg.cls_token_num,
                                                 cfg.caption_dim))
    mesh = pmesh.make_mesh(MeshConfig(data=2, pp=2))
    for head in ["mse", "diff", "mask_diff", "mask_mse"]:
        hcfg = cfg.replace(video_head=head)
        params = gpt_video.init_video_gpt_params(jax.random.key(0), hcfg)
        _, ref = jax.jit(lambda p, c=hcfg: gpt_video.forward_train(
            p, c, latents, cond, jax.random.key(3)))(params)
        psh = pp.pp_param_shardings(params, mesh)
        params_s = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s),
                                          params, psh)
        _, got = jax.jit(lambda p, c=hcfg: gpt_video.forward_train(
            p, c, latents, cond, jax.random.key(3),
            pp_ctx=(2, 2, mesh)))(params_s)
        np.testing.assert_allclose(float(got), float(ref), atol=1e-5,
                                   err_msg=head)


def test_pp_requires_divisible_layers():
    cfg = _cfg(n_layer=3)
    params = gpt.init_gpt_params(jax.random.key(0), cfg)
    idx, cond, targets = _data(cfg)
    with pytest.raises(AssertionError):
        jax.jit(lambda p: pp.pipeline_forward(
            p, cfg, idx, cond, targets=targets,
            num_stages=2, num_microbatches=2))(params)


def test_pp_rejects_per_sample_mask():
    cfg = _cfg()
    params = gpt.init_gpt_params(jax.random.key(0), cfg)
    idx, cond, targets = _data(cfg)
    mask = jnp.ones((4, 1, cfg.block_size, cfg.block_size), bool)
    with pytest.raises(NotImplementedError):
        pp.pipeline_forward(params, cfg, idx, cond, targets=targets,
                            mask=mask, num_stages=2, num_microbatches=2)
