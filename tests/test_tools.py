"""tools/: imagenet label map, figure plotter, ckpt converter."""

import json
import os
import subprocess
import sys

import pytest

from video_llamagen_tpu.tools import imagenet_labels
from video_llamagen_tpu.tools.draw_figure import DATASETS, plot_series


def test_labels_complete_and_parsed():
    labels = imagenet_labels.load_labels()
    assert len(labels) == 1000
    assert imagenet_labels.label_en(0) == "tench"
    assert imagenet_labels.label_cn(0) == "丁鲷"
    assert "golden retriever" in imagenet_labels.label_en_full(207)
    # every entry has a nonempty english name
    assert all(v["en"] for v in labels.values())


def test_labels_match_reference(reference_path):
    """Our JSON must reproduce the reference map exactly (en + cn parts)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "inlab", os.path.join(reference_path, "tools/imagenet_en_cn.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    ours = imagenet_labels.load_labels()
    import re
    for k, v in m.IMAGENET_1K_CLASSES.items():
        mm = re.match(r"^(.*?)\s*\[(.*)\]\s*$", v)
        en, cn = (mm.group(1), mm.group(2)) if mm else (v, "")
        assert ours[k]["en"] == en, k
        assert ours[k]["cn"] == cn, k


def test_label_search():
    hits = imagenet_labels.search("retriever")
    assert 207 in hits and len(hits) >= 2


def test_draw_figures(tmp_path):
    for name, data in DATASETS.items():
        out = tmp_path / f"{name}.png"
        plot_series(data, str(out))
        assert out.stat().st_size > 1000


def test_draw_figure_cli_json(tmp_path):
    data = {"xlabel": "steps", "ylabel": "FID",
            "series": [{"label": "ours", "x": [1, 2], "y": [10.0, 5.0]}]}
    src = tmp_path / "d.json"
    src.write_text(json.dumps(data))
    out = tmp_path / "fig.png"
    from video_llamagen_tpu.tools.draw_figure import main
    assert main(["--data", str(src), str(out)]) == 0
    assert out.exists()


def test_pl_to_torch(tmp_path):
    torch = pytest.importorskip("torch")
    from video_llamagen_tpu.tools.convert_ckpt import pl_to_torch
    sd = {"encoder.w": torch.zeros(2, 2)}
    src = tmp_path / "last.ckpt"
    torch.save({"state_dict": sd, "epoch": 3, "optimizer_states": []}, src)
    dst = tmp_path / "last.pth"
    pl_to_torch(str(src), str(dst))
    out = torch.load(dst, weights_only=False)
    assert set(out) == {"state_dict"}
    assert "encoder.w" in out["state_dict"]


def test_prep_image_json(tmp_path):
    """Folder scan keeps openable images, drops corrupt ones, and the
    --captions mode pairs same-stem .txt files (ref tools/openimage_json.py
    flow)."""
    import json

    import numpy as np
    from PIL import Image

    from video_llamagen_tpu.tools.prep_image_json import main

    d = tmp_path / "data" / "cls0"
    d.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "a.png")
    Image.fromarray(np.ones((8, 8, 3), np.uint8)).save(d / "b.jpg")
    (d / "broken.png").write_bytes(b"not an image")
    (d / "b.txt").write_text("a tiny caption")

    out = tmp_path / "paths.json"
    rels = main([str(tmp_path / "data"), str(out)])
    assert sorted(rels) == ["cls0/a.png", "cls0/b.jpg"]
    assert sorted(json.load(open(out))) == ["cls0/a.png", "cls0/b.jpg"]

    outl = tmp_path / "recs.jsonl"
    main([str(tmp_path / "data"), str(outl), "--captions"])
    recs = [json.loads(l) for l in open(outl)]
    by_path = {r["path"]: r["cap"] for r in recs}
    assert by_path["cls0/b.jpg"] == ["a tiny caption"]
    assert by_path["cls0/a.png"] == []


def test_t2i_quality_color_classifier_and_features():
    """t2i quality loop pieces that don't need the chip: the pixel color
    classifier must read quality_loop-rendered shapes correctly, and the
    pseudo-T5 caption features must be deterministic and class-distinct."""
    import importlib.util, os, sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import numpy as np
    from quality_loop import render
    spec = importlib.util.spec_from_file_location(
        "t2i_quality", os.path.join(root, "scripts", "t2i_quality.py"))
    t2i = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t2i)

    rs = np.random.RandomState(0)
    imgs = np.stack([render(c, rs) for c in range(16) for _ in range(4)])
    labels = np.repeat(np.arange(16), 4)
    acc = (t2i.classify_color(imgs) == labels % 4).mean()
    assert acc > 0.9, acc

    f1, f2 = t2i.caption_features(), t2i.caption_features()
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (16, 120, 512)
    # distinct per class
    assert np.abs(f1[0] - f1[1]).mean() > 0.1
