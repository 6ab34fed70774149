"""Metric-stack value parity vs the reference with SAME RANDOM WEIGHTS
(VERDICT r1 next-step #7).

Published weights are absent (zero egress), which excuses absolute metric
values — not implementation parity: both stacks can run identical random
weights and must agree. Covers RAFT optical flow (full BasicEncoder incl.
eval-BatchNorm cnet), VGG-LPIPS (reference lpips.py run verbatim with a
stubbed torchvision vgg16), and the FVD Fréchet math.
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
nn = torch.nn


# ---------------------------------------------------------------------------
# FVD math
# ---------------------------------------------------------------------------

def _import_file(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_fvd_math_matches_reference(reference_path):
    """fvd_from_features == reference styleganv frechet_distance on random
    feature sets (eval/fvd/styleganv/fvd.py:75-93)."""
    ref = _import_file(
        "ref_fvd", reference_path +
        "/CausalVideoVAE/causalvideovae/eval/fvd/styleganv/fvd.py")
    from video_llamagen_tpu.evals.fvd import fvd_from_features

    rng = np.random.default_rng(0)
    real = rng.normal(size=(64, 40)).astype(np.float64)
    fake = (rng.normal(size=(80, 40)) * 1.3 + 0.2).astype(np.float64)
    want = float(ref.frechet_distance(fake, real))
    got = fvd_from_features(real, fake)
    assert abs(got - want) / max(abs(want), 1e-6) < 1e-4, (got, want)


# ---------------------------------------------------------------------------
# RAFT
# ---------------------------------------------------------------------------

def _import_raft(reference_path):
    name = "raftcore"
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [reference_path +
                        "/CausalVideoVAE/causalvideovae/eval/RAFT/core"]
        sys.modules[name] = pkg
    import importlib
    return importlib.import_module("raftcore.raft")


def test_raft_flow_parity(reference_path):
    """Full RAFT (BasicEncoder instance-norm fnet + BATCH-norm cnet,
    BasicUpdateBlock with convex upsampling): random weights, same images,
    same flow (ref eval/RAFT/core/raft.py:54-56, 100-140)."""
    raft_mod = _import_raft(reference_path)
    import argparse
    args = argparse.Namespace(small=False, dropout=0.0, alternate_corr=False,
                              mixed_precision=False)
    torch.manual_seed(0)
    tm = raft_mod.RAFT(args).eval()
    # randomize BN running stats so eval-BN import is non-trivially checked,
    # and damp conv weights: default kaiming init explodes to NaN through the
    # 4-level corr pyramid (the published weights are much smaller)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, nn.Conv2d):
                m.weight.mul_(0.3)

    from video_llamagen_tpu.evals.raft import (import_raft_state_dict,
                                               raft_forward)
    params = import_raft_state_dict(tm.state_dict())

    # >=128px: at 64px the 1/8-res features are 8x8, whose level-3 corr is
    # 1x1 and the reference's grid normalization divides by (W-1)=0 -> NaN
    rs = np.random.RandomState(1)
    im1 = rs.rand(1, 3, 128, 128).astype(np.float32) * 255.0
    im2 = np.clip(im1 + rs.randn(1, 3, 128, 128).astype(np.float32) * 8,
                  0, 255)
    with torch.no_grad():
        _, want = tm(torch.from_numpy(im1), torch.from_numpy(im2), iters=4,
                     test_mode=True)
    want = want.numpy()

    got = raft_forward(params, jnp.asarray(im1.transpose(0, 2, 3, 1)),
                       jnp.asarray(im2.transpose(0, 2, 3, 1)), iters=4)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

def _vgg16_features():
    """torchvision vgg16().features layout (config D), random init."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(inplace=True)]
            cin = v
    return nn.Sequential(*layers)


def _import_ref_lpips(reference_path, tmp_path):
    """Run the reference lpips.py verbatim with stubbed torchvision/requests
    and a random vgg.pth in its expected cache location."""
    class _VGG(nn.Module):
        def __init__(self, pretrained=True):
            super().__init__()
            torch.manual_seed(7)
            self.features = _vgg16_features()

    tv_models = types.ModuleType("torchvision.models")
    tv_models.vgg16 = lambda pretrained=True: _VGG(pretrained)
    tv = types.ModuleType("torchvision")
    tv.models = tv_models
    sys.modules.setdefault("torchvision", tv)
    sys.modules["torchvision.models"] = tv_models
    sys.modules.setdefault("requests", types.ModuleType("requests"))
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda *a, **k: None
    sys.modules.setdefault("tqdm", tqdm_mod)

    mod = _import_file("ref_lpips",
                       reference_path + "/tokenizer/tokenizer_image/lpips.py")

    # random lin heads written where get_ckpt_path would download them
    torch.manual_seed(8)
    lin_sd = {f"lin{i}.model.1.weight":
              torch.rand(1, c, 1, 1) for i, c in
              enumerate([64, 128, 256, 512, 512])}
    ckpt = tmp_path / "vgg.pth"
    torch.save(lin_sd, ckpt)
    mod.get_ckpt_path = lambda name, root, check=False: str(ckpt)
    return mod


def test_lpips_parity(reference_path, tmp_path):
    """Reference LPIPS (lpips.py:51-103) vs tokenizers/vq/losses.lpips with
    identical random VGG + lin weights exported through the npz format."""
    mod = _import_ref_lpips(reference_path, tmp_path)
    tm = mod.LPIPS(use_dropout=True).eval()

    # export torch weights -> our npz layout -> load
    import io
    arrays = {}
    convs = [m for m in tm.net.modules() if isinstance(m, nn.Conv2d)]
    assert len(convs) == 13
    for i, c in enumerate(convs):
        arrays[f"conv{i}_w"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        arrays[f"conv{i}_b"] = c.bias.detach().numpy()
    for j, lin in enumerate([tm.lin0, tm.lin1, tm.lin2, tm.lin3, tm.lin4]):
        arrays[f"lin{j}"] = lin.model[1].weight.detach().numpy()[0, :, 0, 0]
    arrays["shift"] = tm.scaling_layer.shift.numpy()
    arrays["scale"] = tm.scaling_layer.scale.numpy()
    npz = tmp_path / "lpips.npz"
    np.savez(npz, **arrays)

    from video_llamagen_tpu.tokenizers.vq.losses import load_lpips_npz, lpips
    params = load_lpips_npz(str(npz))

    rs = np.random.RandomState(2)
    x = rs.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    y = rs.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy().reshape(-1)
    got = np.asarray(lpips(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
