"""RAFT flow model: shapes, warp correctness, warp-error metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llamagen_tpu.evals import raft


@pytest.fixture(scope="module")
def params():
    return raft.init_raft_params(jax.random.key(0))


def test_warp_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3)
                      .astype(np.float32))
    flow = jnp.zeros((1, 8, 8, 2))
    out = raft.warp(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_shift():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    flow = jnp.ones((1, 4, 4, 2)) * jnp.asarray([1.0, 0.0])  # sample from x+1
    out = np.asarray(raft.warp(img, flow))
    np.testing.assert_allclose(out[0, 0, 0, 0], 1.0)  # pixel (0,0) <- (1,0)


def test_raft_forward_shapes(params):
    rs = np.random.RandomState(1)
    img1 = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32) * 255)
    flow = raft.raft_forward(params, img1, img2, iters=2)
    assert flow.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_warp_error_identical_frames(params):
    rs = np.random.RandomState(2)
    frame = rs.rand(1, 32, 32, 3).astype(np.float32) * 255
    frames = jnp.asarray(np.stack([frame, frame], axis=1))[:, :, 0]
    frames = jnp.asarray(np.repeat(frame[:, None], 3, axis=1))
    err = raft.warp_error(params, frames, iters=2)
    assert err.shape == (1,)
    # identical frames: even bad flow warps a constant-ish image; just finite
    assert np.isfinite(float(err[0]))
