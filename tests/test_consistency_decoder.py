"""Consistency-decoder VAE: shapes, parametrization identities, sampling.

Parity target: diffusers ConsistencyDecoderVAE as used by the reference's
tokenizer/consistencydecoder/cd_demo.py (2-step decode of scaled latents).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.tokenizers.consistency_decoder import (
    CDConfig, cd_schedule, consistency_coeffs, consistency_fn, decode,
    encode, init_cd_params, reconstruct)

# GroupNorm is 32-group (SD/ADM convention) so every channel count must be a
# multiple of 32, same as the real config
TINY = CDConfig(enc_ch=32, enc_ch_mult=(1, 1, 2, 2), enc_num_res=1,
                unet_ch=32, unet_ch_mult=(1, 2), unet_num_res=1,
                total_timesteps=64)


@pytest.fixture(scope="module")
def params():
    return init_cd_params(jax.random.key(0), TINY)


def test_encode_shape_and_scaling(params):
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    lat = encode(params, TINY, x, jax.random.key(2))
    assert lat.shape == (2, 4, 4, TINY.latent_ch)          # 8x down
    # scaled latents: same rng, config with scaling 1.0 gives lat/0.18215
    cfg1 = CDConfig(**{**TINY.__dict__, "scaling_factor": 1.0})
    lat1 = encode(params, cfg1, x, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat1) * 0.18215,
                               rtol=1e-5, atol=1e-6)


def test_decode_shape_and_range(params):
    lat = jax.random.normal(jax.random.key(3), (2, 4, 4, TINY.latent_ch))
    out = decode(params, TINY, lat, jax.random.key(4))
    assert out.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0             # clipped to [-1,1]


def test_roundtrip_shape(params):
    x = jax.random.normal(jax.random.key(5), (1, 32, 32, 3))
    out = reconstruct(params, TINY, x, jax.random.key(6))
    assert out.shape == x.shape


def test_consistency_coeff_identities():
    # sigma -> 0: f(x) -> x (c_skip -> 1, c_out -> 0); boundary condition of
    # the consistency parametrization
    c_skip, c_out, c_in = consistency_coeffs(jnp.asarray(0.0), 0.5)
    assert float(c_skip) == pytest.approx(1.0)
    assert float(c_out) == pytest.approx(0.0)
    assert float(c_in) == pytest.approx(2.0)               # 1/sigma_data
    # large sigma: input scaling shrinks, skip vanishes
    c_skip, c_out, c_in = consistency_coeffs(jnp.asarray(100.0), 0.5)
    assert float(c_skip) < 1e-3 and float(c_in) < 0.011


def test_schedule_monotone():
    s = cd_schedule(TINY)["sigmas"]
    assert s.shape == (TINY.total_timesteps,)
    assert np.all(np.diff(s) > 0) and s[0] < 0.1           # sigma grows with t


def test_zero_init_unet_returns_cskip_x(params):
    # conv_out is zero-init so F(x)=0 and f(x) = c_skip * x exactly at init
    sigmas = jnp.asarray(cd_schedule(TINY)["sigmas"])
    x = jax.random.normal(jax.random.key(7), (1, 16, 16, 3))
    lat = jax.random.normal(jax.random.key(8), (1, 2, 2, TINY.latent_ch))
    t = jnp.asarray([10], jnp.int32)
    out = consistency_fn(params["unet"], TINY, sigmas, x, t, lat)
    c_skip, _, _ = consistency_coeffs(sigmas[10], TINY.sigma_data)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c_skip * x),
                               rtol=1e-4, atol=1e-5)


def test_decode_deterministic_and_latent_sensitive(params):
    lat = jax.random.normal(jax.random.key(9), (1, 4, 4, TINY.latent_ch))
    a = decode(params, TINY, lat, jax.random.key(10))
    b = decode(params, TINY, lat, jax.random.key(10))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # perturb a non-output-path weight so the latent conditioning matters
    p2 = jax.tree_util.tree_map(lambda v: v, params)
    p2["unet"]["conv_out"]["kernel"] = (
        params["unet"]["conv_out"]["kernel"] + 0.1)
    c = decode(p2, TINY, lat * 5.0, jax.random.key(10))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_decode_jit_matches_eager(params):
    lat = jax.random.normal(jax.random.key(11), (1, 4, 4, TINY.latent_ch))
    eager = decode(params, TINY, lat, jax.random.key(12))
    jitted = jax.jit(lambda p, l, r: decode(p, TINY, l, r))(
        params, lat, jax.random.key(12))
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=2e-4, atol=2e-5)
