"""RoPE table parity vs the torch reference (gpt.py:407-437, gpt_video.py:532)."""

import sys

import numpy as np
import pytest

from video_llamagen_tpu.core import rope


def _load_reference_gpt(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import importlib
    mod = importlib.import_module("autoregressive.models.gpt")
    return mod


class TestAgainstTorchReference:
    def test_freqs_2d_parity(self, reference_path):
        ref = _load_reference_gpt(reference_path)
        got = np.asarray(rope.precompute_freqs_2d(16, 64, 10000.0, cls_token_num=1))
        want = ref.precompute_freqs_cis_2d(16, 64, 10000, cls_token_num=1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_freqs_1d_parity(self, reference_path):
        ref = _load_reference_gpt(reference_path)
        got = np.asarray(rope.precompute_freqs_1d(32, 64, 10000.0, cls_token_num=120))
        want = ref.precompute_freqs_cis(32, 64, 10000, cls_token_num=120).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_freqs_3d_video_parity(self, reference_path):
        # gpt_video.py imports torchvision at module scope, which isn't in this
        # image; its precompute_freqs_cis_3d_video (gpt_video.py:532-552) is
        # exactly the 2D cache tiled vae_t times, so build the golden value
        # from the importable 2D reference.
        ref = _load_reference_gpt(reference_path)
        got = np.asarray(rope.precompute_freqs_3d_video(8, 5, 64, 10000.0,
                                                        cls_token_num=120))
        grid = ref.precompute_freqs_cis_2d(8, 64, 10000, cls_token_num=0).numpy()
        want = np.concatenate([np.zeros((120, 32, 2)),
                               np.tile(grid[None], (5, 1, 1, 1)).reshape(-1, 32, 2)])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_apply_rotary_parity(self, reference_path):
        import torch
        ref = _load_reference_gpt(reference_path)
        x = np.random.RandomState(0).randn(2, 17, 4, 64).astype(np.float32)
        freqs = ref.precompute_freqs_cis_2d(4, 64, 10000, cls_token_num=1)[:17]
        want = ref.apply_rotary_emb(torch.from_numpy(x), freqs).numpy()
        got = np.asarray(rope.apply_rotary_emb(x, np.asarray(freqs.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestStandalone:
    def test_cls_prefix_is_zero(self):
        t = np.asarray(rope.precompute_freqs_2d(4, 32, cls_token_num=7))
        assert t.shape == (7 + 16, 16, 2)
        np.testing.assert_array_equal(t[:7], 0.0)

    def test_3d_is_tiled_2d(self):
        t2 = np.asarray(rope.precompute_freqs_2d(4, 32, cls_token_num=0))
        t3 = np.asarray(rope.precompute_freqs_3d_video(4, 3, 32, cls_token_num=0))
        assert t3.shape[0] == 3 * 16
        for i in range(3):
            np.testing.assert_array_equal(t3[i * 16:(i + 1) * 16], t2)

    def test_factored_3d_distinct_frames(self):
        t = np.asarray(rope.precompute_freqs_3d_factored(4, 3, 32, cls_token_num=0))
        assert not np.array_equal(t[:16], t[16:32])

    def test_rotary_preserves_norm(self):
        import jax.numpy as jnp
        x = np.random.RandomState(1).randn(2, 16, 4, 32).astype(np.float32)
        freqs = rope.precompute_freqs_2d(4, 32, cls_token_num=0)
        out = np.asarray(rope.apply_rotary_emb(jnp.asarray(x), freqs))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4)
