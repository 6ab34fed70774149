"""Diffusion core + DiffLoss head tests (schedules vs torch reference, loops)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.diffusion import gaussian as gd
from video_llamagen_tpu.models.diffloss import (
    DiffLossConfig, init_diffloss_params, mlp_adaln_forward,
    diffloss_train, diffloss_sample, timestep_embedding)


def test_cosine_schedule_matches_reference(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from diffusion import gaussian_diffusion as ref_gd
    want = ref_gd.get_named_beta_schedule("cosine", 1000)
    got = gd.get_named_beta_schedule("cosine", 1000)
    np.testing.assert_allclose(got, want, atol=1e-12)
    want_lin = ref_gd.get_named_beta_schedule("linear", 1000)
    got_lin = gd.get_named_beta_schedule("linear", 1000)
    np.testing.assert_allclose(got_lin, want_lin, atol=1e-12)


def test_space_timesteps_matches_reference(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from diffusion.respace import space_timesteps as ref_st
    for spec in ["100", "50", "ddim25", "10,20,30"]:
        assert gd.space_timesteps(1000, spec) == sorted(ref_st(1000, spec))


def test_respaced_betas_match_reference(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from diffusion import create_diffusion as ref_create
    ref = ref_create(timestep_respacing="100", noise_schedule="cosine")
    ours = gd.create_diffusion("100", "cosine")
    np.testing.assert_allclose(ours.betas, np.asarray(ref.betas), atol=1e-10)
    np.testing.assert_allclose(ours.timestep_map, np.asarray(ref.timestep_map))


def test_q_sample_roundtrip():
    diff = gd.create_diffusion("", "cosine")
    x0 = jnp.ones((4, 8))
    t = jnp.zeros((4,), jnp.int32)
    noise = jnp.zeros((4, 8))
    xt = diff.q_sample(x0, t, noise)
    # at t=0 with cosine schedule, x_t ~ x0 (alpha_cumprod[0] ~ 1)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0), atol=0.01)


def test_training_losses_finite():
    diff = gd.create_diffusion("", "cosine")
    rng = jax.random.key(0)

    def model_fn(x_t, t_orig):
        return jnp.concatenate([x_t * 0.1, jnp.zeros_like(x_t)], axis=-1)

    x0 = jax.random.normal(rng, (8, 4))
    t = jax.random.randint(rng, (8,), 0, diff.num_timesteps)
    loss = diff.training_losses(model_fn, x0, t, rng)
    assert loss.shape == (8,)
    assert np.isfinite(np.asarray(loss)).all()


def test_p_sample_loop_shapes():
    diff = gd.create_diffusion("4", "cosine")
    assert diff.num_timesteps == 4

    def model_fn(x, t_orig):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)

    noise = jax.random.normal(jax.random.key(0), (3, 5))
    out = diff.p_sample_loop(model_fn, noise, jax.random.key(1))
    assert out.shape == (3, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_p_sample_loop_x0_clip_bounds_divergence():
    """x0_clip caps the x0-estimate error injection (see p_mean_variance
    docstring): an adversarial eps that always pushes the x0 estimate out of
    range must not blow up the chain when the clip is on, and must blow it
    up when off (that contrast is the measured failure mode of the
    reference's clip_denoised=False on latents, ref diffloss.py:48)."""
    diff = gd.create_diffusion("10", "cosine")

    def bad_model(x, t_orig):
        # constant large wrong eps -> x0_pred = sra*x - srm*50 explodes
        return jnp.concatenate([jnp.full_like(x, 50.0),
                                jnp.zeros_like(x)], axis=-1)

    noise = jax.random.normal(jax.random.key(0), (4, 4))
    unclipped = diff.p_sample_loop(bad_model, noise, jax.random.key(1))
    clipped = diff.p_sample_loop(bad_model, noise, jax.random.key(1),
                                 x0_clip=10.0)
    assert float(jnp.abs(unclipped).max()) > 1e3
    # mean is a convex-ish combination of clipped x0 (<=10) and x_t, plus
    # unit-scale noise: stays within a few times the clip bound
    assert float(jnp.abs(clipped).max()) < 40.0


TINY_DL = DiffLossConfig(target_channels=4, z_channels=16, depth=2, width=32,
                         num_sampling_steps="4")


@pytest.fixture(scope="module")
def dl_params():
    return init_diffloss_params(jax.random.key(0), TINY_DL)


def test_mlp_adaln_zero_init_output(dl_params):
    """Zero-init final layer -> output exactly zero at init (ref diffloss.py:210-214)."""
    x = jax.random.normal(jax.random.key(1), (6, 4))
    t = jnp.zeros((6,), jnp.int32)
    c = jax.random.normal(jax.random.key(2), (6, 16))
    out = mlp_adaln_forward(dl_params, TINY_DL, x, t, c)
    assert out.shape == (6, 8)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_diffloss_train_finite(dl_params):
    target = jax.random.normal(jax.random.key(3), (10, 4))
    z = jax.random.normal(jax.random.key(4), (10, 16))
    loss = diffloss_train(dl_params, TINY_DL, target, z, jax.random.key(5))
    assert np.isfinite(float(loss))
    # masked variant
    mask = jnp.asarray([1.0] * 5 + [0.0] * 5)
    loss_m = diffloss_train(dl_params, TINY_DL, target, z, jax.random.key(5),
                            mask=mask)
    assert np.isfinite(float(loss_m))


def test_diffloss_sample_shapes_and_cfg(dl_params):
    z = jax.random.normal(jax.random.key(6), (8, 16))
    out = diffloss_sample(dl_params, TINY_DL, z, jax.random.key(7))
    assert out.shape == (8, 4)
    # CFG path: eps is shared across halves but per-half learned variance and
    # noise still diverge (reference behavior — caller keeps the first half)
    out_cfg = diffloss_sample(dl_params, TINY_DL, z, jax.random.key(8),
                              cfg_scale=2.0)
    assert out_cfg.shape == (8, 4)
    assert np.isfinite(np.asarray(out_cfg)).all()
    # traced cfg_scale (Muse ramp) also works
    out_tr = diffloss_sample(dl_params, TINY_DL, z, jax.random.key(9),
                             cfg_scale=jnp.asarray(1.7))
    assert np.isfinite(np.asarray(out_tr)).all()


def test_timestep_embedding_matches_reference(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import torch
    from autoregressive.models.diffloss import TimestepEmbedder
    t = np.array([0, 1, 57, 999])
    want = TimestepEmbedder.timestep_embedding(torch.from_numpy(t), 64).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), 64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ddim_sample_loop_shapes():
    diff = gd.create_diffusion("4", "cosine")

    def model_fn(x, t_orig):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)

    noise = jax.random.normal(jax.random.key(0), (3, 5))
    out = diff.ddim_sample_loop(model_fn, noise, jax.random.key(1))
    assert out.shape == (3, 5)
    assert np.isfinite(np.asarray(out)).all()
    # eta=0 is deterministic: same noise, different rng -> same output
    out2 = diff.ddim_sample_loop(model_fn, noise, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
