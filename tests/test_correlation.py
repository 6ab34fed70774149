"""Correlation op: XLA and Pallas vs brute force; lookup sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_llamagen_tpu.evals import correlation as corr


def _brute_volume(f1, f2):
    b, h, w, c = f1.shape
    v = np.einsum("bpc,bqc->bpq", f1.reshape(b, h * w, c),
                  f2.reshape(b, h * w, c)) / np.sqrt(c)
    return v.reshape(b, h, w, h, w)


def test_corr_volume_matches_bruteforce():
    rs = np.random.RandomState(0)
    f1 = rs.randn(2, 4, 6, 8).astype(np.float32)
    f2 = rs.randn(2, 4, 6, 8).astype(np.float32)
    got = np.asarray(corr.corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(got, _brute_volume(f1, f2), atol=1e-4)


def test_corr_volume_pallas_matches():
    rs = np.random.RandomState(1)
    f1 = rs.randn(4, 6, 8).astype(np.float32)
    f2 = rs.randn(4, 6, 8).astype(np.float32)
    interpret = jax.default_backend() != "tpu"
    got = np.asarray(corr.corr_volume_pallas(jnp.asarray(f1), jnp.asarray(f2),
                                             interpret=interpret))
    want = _brute_volume(f1[None], f2[None])[0].reshape(24, 24)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bilinear_sample_exact_grid():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    pts = jnp.asarray([[0.0, 0.0], [3.0, 2.0], [1.0, 1.0]])
    out = np.asarray(corr.bilinear_sample(img, pts))[:, 0]
    np.testing.assert_allclose(out, [0.0, 11.0, 5.0])
    # halfway between (0,0) and (1,0): 0.5
    out2 = float(corr.bilinear_sample(img, jnp.asarray([[0.5, 0.0]]))[0, 0])
    np.testing.assert_allclose(out2, 0.5)
    # out of bounds -> 0
    out3 = float(corr.bilinear_sample(img, jnp.asarray([[-5.0, 0.0]]))[0, 0])
    assert out3 == 0.0


def test_corr_lookup_identity_flow():
    """At identity coords, the center tap equals vol[y, x, y, x]."""
    rs = np.random.RandomState(2)
    f1 = rs.randn(1, 4, 4, 4).astype(np.float32)
    vol = corr.corr_volume(jnp.asarray(f1), jnp.asarray(f1))
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = np.asarray(corr.corr_lookup(vol, coords, radius=1))  # (1,4,4,9)
    center = out[0, :, :, 4]
    want = np.asarray(vol)[0, ys, xs, ys, xs]
    np.testing.assert_allclose(center, want, atol=1e-4)


def test_corr_pyramid_levels():
    rs = np.random.RandomState(3)
    f1 = rs.randn(1, 8, 8, 4).astype(np.float32)
    pyr = corr.corr_pyramid(jnp.asarray(f1), jnp.asarray(f1), num_levels=3)
    assert pyr[0].shape == (1, 8, 8, 8, 8)
    assert pyr[1].shape == (1, 8, 8, 4, 4)
    assert pyr[2].shape == (1, 8, 8, 2, 2)
