"""Dataset-prep: scan image folders -> validated path-list json.

Parity surface for the reference's tools/openimage_json.py (walk class
subfolders, keep only images PIL can actually open, dump the relative-path
list as json for the t2i dataset builders). Rebuilt single-process with a
thread pool (the reference uses multiprocessing; IO-bound validation only
needs threads) and an optional caption sidecar: `--captions` pairs each image
with a same-stem .txt caption, emitting the t2i jsonl record shape
({"path": ..., "cap": [...]}) instead of a bare path list.

    python -m video_llamagen_tpu.tools.prep_image_json DATA_DIR out.json
    python -m video_llamagen_tpu.tools.prep_image_json DATA_DIR out.jsonl \
        --captions
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ThreadPoolExecutor

EXTENSIONS = {".jpg", ".jpeg", ".png", ".webp", ".bmp"}


def _openable(path: str) -> bool:
    from PIL import Image
    try:
        with Image.open(path) as im:
            im.verify()
        return True
    except Exception:
        return False


def scan(data_dir: str, validate: bool = True, workers: int = 8):
    """Relative paths of every (optionally openable) image under data_dir."""
    rels = []
    for root, _, files in os.walk(data_dir):
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in EXTENSIONS:
                rels.append(os.path.relpath(os.path.join(root, f), data_dir))
    if not validate:
        return rels
    with ThreadPoolExecutor(workers) as ex:
        keep = ex.map(lambda r: _openable(os.path.join(data_dir, r)), rels)
    return [r for r, ok in zip(rels, keep) if ok]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir")
    p.add_argument("out")
    p.add_argument("--no-validate", action="store_true",
                   help="skip the PIL open check (fast listing only)")
    p.add_argument("--captions", action="store_true",
                   help="emit jsonl records with same-stem .txt captions")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args(argv)

    rels = scan(args.data_dir, validate=not args.no_validate,
                workers=args.workers)
    if args.captions:
        with open(args.out, "w") as f:
            for r in rels:
                cap_path = os.path.join(args.data_dir,
                                        os.path.splitext(r)[0] + ".txt")
                caps = []
                if os.path.exists(cap_path):
                    with open(cap_path) as cf:
                        caps = [cf.read().strip()]
                f.write(json.dumps({"path": r, "cap": caps}) + "\n")
    else:
        with open(args.out, "w") as f:
            json.dump(rels, f)
    print(f"{len(rels)} images -> {args.out}")
    return rels


if __name__ == "__main__":
    main()
