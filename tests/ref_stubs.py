"""Import the reference CausalVideoVAE package with its heavy deps stubbed.

The reference model code only *imports* diffusers / pytorch_lightning /
decord / pytorchvideo / torchvision at module scope (video IO + HF plumbing);
the math path (Encoder/Decoder/CausalConv3d/...) is pure torch. Stubbing the
missing packages lets parity tests instantiate the FULL reference
CausalVAEModel at production shapes on CPU (VERDICT r1 next-step #4).
"""

import sys
import types


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def install_reference_stubs():
    import torch.nn as nn

    def register_to_config(fn):
        return fn

    d = _stub("diffusers", ModelMixin=nn.Module, ConfigMixin=object)
    d.__path__ = []  # mark as package so 'diffusers.utils' import works
    _stub("diffusers.configuration_utils",
          register_to_config=register_to_config, ConfigMixin=object)
    _stub("diffusers.models", ModelMixin=nn.Module).__path__ = []
    _stub("diffusers.models.modeling_utils", ModelMixin=nn.Module)
    _stub("diffusers.utils", is_bs4_available=lambda: False,
          is_ftfy_available=lambda: False)
    _stub("pytorch_lightning", LightningModule=nn.Module,
          Trainer=object, Callback=object)
    _stub("decord", VideoReader=None, cpu=None)
    _stub("pytorchvideo").__path__ = []
    _stub("pytorchvideo.transforms", ShortSideScale=None)
    tv = _stub("torchvision")
    tv.__path__ = []
    _stub("torchvision.io", read_video=None, write_video=None)
    t = _stub("torchvision.transforms", Lambda=None, Compose=None,
              ToTensor=None, Normalize=None, Resize=None, CenterCrop=None)
    t.__path__ = []
    _stub("torchvision.transforms._transforms_video", CenterCropVideo=None,
          RandomCropVideo=None)
    _stub("torchvision.utils", save_image=None, make_grid=None)
    _stub("torchvision.models", vgg16=None)


def import_causalvideovae(reference_path):
    """Returns the causalvideovae package (stubbed deps)."""
    install_reference_stubs()
    if "causalvideovae" not in sys.modules:
        pkg = types.ModuleType("causalvideovae")
        pkg.__path__ = [reference_path + "/CausalVideoVAE/causalvideovae"]
        sys.modules["causalvideovae"] = pkg
    import importlib
    return importlib.import_module(
        "causalvideovae.model.causal_vae.modeling_causalvae")
