"""CLI smoke tests for the thin entry points no other test imports.

These mirror the reference's demo/train CLIs (sample_c2i.py README.md:73,
train_t2i.py, tools/check_image_codes.py) at tiny shapes — the internals
are parity-tested elsewhere; this pins the argparse surface and wiring."""

import sys

import numpy as np
import pytest


def test_sample_c2i_cli(tmp_path):
    from video_llamagen_tpu.inference import sample_c2i
    out = tmp_path / "grid.png"
    sample_c2i.main([
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-8",
        "--image-size", "32", "--downsample-size", "8",
        "--num-classes", "10", "--classes", "1", "2",
        "--top-k", "16", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0


def test_train_t2i_cli(tmp_path):
    from video_llamagen_tpu.train import train_t2i
    state = train_t2i.main([
        "--gpt-model", "GPT-nano", "--image-size", "16",
        "--downsample-size", "8", "--cls-token-num", "6",
        "--caption-dim", "16", "--global-batch-size", "4",
        "--max-steps", "2", "--log-every", "1",
        "--results-dir", str(tmp_path)])
    assert int(state.step) == 2


def test_check_codes_cli(tmp_path, monkeypatch, capsys):
    from video_llamagen_tpu.tools import check_codes
    codes = np.random.RandomState(0).randint(0, 512, (4, 16), np.int64)
    path = tmp_path / "codes.npy"
    np.save(path, codes)
    monkeypatch.chdir(tmp_path)  # --decode writes sample_image_code.png to cwd
    monkeypatch.setattr(sys, "argv", [
        "check_codes", "--code-path", str(path), "--vq-model", "VQ-8",
        "--codebook-size", "512", "--image-size", "32", "--decode"])
    check_codes.main()
    outp = capsys.readouterr().out
    assert "unique" in outp or "min" in outp
    assert (tmp_path / "sample_image_code.png").exists()
