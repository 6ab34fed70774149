"""ImageNet-1k class-label map (EN + CN) with lookup/search CLI.

Parity surface for reference tools/imagenet_en_cn.py (IMAGENET_1K_CLASSES:
1000 'english names [中文]' strings keyed by class id). Here the data lives in
resources/imagenet_labels.json (split into en/cn fields) and this module is
the API:

    from video_llamagen_tpu.tools.imagenet_labels import label_en, label_cn
    label_en(207)  -> 'golden retriever'

CLI:
    python -m video_llamagen_tpu.tools.imagenet_labels 207 985
    python -m video_llamagen_tpu.tools.imagenet_labels --search retriever
"""

from __future__ import annotations

import argparse
import functools
import json
import os
from typing import Dict

_JSON = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "resources", "imagenet_labels.json")


@functools.lru_cache(maxsize=1)
def load_labels() -> Dict[int, Dict[str, str]]:
    with open(_JSON, encoding="utf-8") as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def label_en(class_id: int) -> str:
    """Primary English name (first synonym) for a class id."""
    return load_labels()[class_id]["en"].split(",")[0].strip()


def label_en_full(class_id: int) -> str:
    """Full comma-separated English synonym list."""
    return load_labels()[class_id]["en"]


def label_cn(class_id: int) -> str:
    return load_labels()[class_id]["cn"]


def search(term: str) -> Dict[int, str]:
    """Case-insensitive substring search over EN+CN names."""
    term = term.lower()
    hits = {}
    for cid, v in load_labels().items():
        if term in v["en"].lower() or term in v["cn"]:
            hits[cid] = v["en"]
    return hits


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("class_ids", nargs="*", type=int)
    p.add_argument("--search", default=None)
    args = p.parse_args(argv)
    if args.search:
        for cid, name in sorted(search(args.search).items()):
            print(f"{cid}\t{name}")
    for cid in args.class_ids:
        v = load_labels()[cid]
        print(f"{cid}\t{v['en']} [{v['cn']}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
