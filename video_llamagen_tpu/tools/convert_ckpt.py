"""Checkpoint format converters.

Parity surface for reference tools/convert_pytorch_lightning_to_torch.py
(strip a PyTorch-Lightning .ckpt down to {'state_dict': ...} so the taming
VQGAN loaders accept it) — generalized into a CLI that takes explicit paths
instead of a hard-coded pretrained_models/ list:

    python -m video_llamagen_tpu.tools.convert_ckpt pl-to-torch in.ckpt out.pth

The resulting .pth feeds core/torch_import.py's taming importer
(import_taming_vqgan_state_dict) for JAX-side loading.
"""

from __future__ import annotations

import argparse


def pl_to_torch(src: str, dst: str) -> None:
    """Lightning ckpt (state_dict + trainer state) -> bare {'state_dict': ...}."""
    import torch
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    if "state_dict" not in ckpt:
        raise ValueError(f"{src} has no 'state_dict' key: {sorted(ckpt)[:10]}")
    torch.save({"state_dict": ckpt["state_dict"]}, dst)
    print(f"saved {dst} ({len(ckpt['state_dict'])} tensors)")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("pl-to-torch")
    c.add_argument("src")
    c.add_argument("dst")
    args = p.parse_args(argv)
    if args.cmd == "pl-to-torch":
        pl_to_torch(args.src, args.dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
