"""Paper figures: FID-vs-epochs scaling law, top-k / CFG sweeps.

Parity surface for reference tools/draw_figure.py (fid_scaling_law_no_cfg /
_cfg, sample_topk, sample_cfg). Rebuilt data-driven: one generic line/dual-axis
plotter fed either by the published LlamaGen numbers below (the reference's
embedded measurements, draw_figure.py:6-12, 43-50, 80-84, 108-113 — kept so
the stock figures reproduce) or by a JSON file of measured series, e.g. the
output of our own sampling->FID loop:

    python -m video_llamagen_tpu.tools.draw_figure scaling_cfg out.png
    python -m video_llamagen_tpu.tools.draw_figure --data my_runs.json out.png

JSON format: {"xlabel": ..., "ylabel": ...,
              "series": [{"label": "B", "x": [...], "y": [...]}, ...],
              "y2": {"label": "IS", "x": [...], "y": [...]}}   # optional
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

# Published measurements from the reference fork (facts, not code):
# FID on ImageNet 256 vs training epochs, per model size.
DATASETS: Dict[str, dict] = {
    "scaling_no_cfg": {
        "xlabel": "Training Epochs", "ylabel": "FID",
        "series": [
            {"label": "B", "x": [50, 100, 200, 300],
             "y": [41.025, 33.442, 32.105, 32.196]},
            {"label": "L", "x": [50, 100, 200, 300],
             "y": [25.889, 24.654, 19.742, 19.070]},
            {"label": "XL", "x": [50, 100, 200, 300],
             "y": [19.820, 18.037, 14.772, 15.549]},
            {"label": "XXL", "x": [50, 200, 300],
             "y": [17.195, 13.997, 14.648]},
            {"label": "3B", "x": [50, 200, 300],
             "y": [16.431, 9.949, 9.380]},
        ],
    },
    "scaling_cfg": {
        "xlabel": "Training Epochs", "ylabel": "FID",
        "series": [
            {"label": "B", "x": [50, 100, 200, 300],
             "y": [8.309, 7.256, 6.542, 6.249]},
            {"label": "L", "x": [50, 100, 200, 300],
             "y": [4.240, 3.705, 3.220, 3.075]},
            {"label": "XL", "x": [50, 100, 200, 300],
             "y": [3.420, 3.089, 2.617, 2.629]},
            {"label": "XXL", "x": [50, 200, 300],
             "y": [2.893, 2.331, 2.340]},
            {"label": "3B", "x": [50, 200, 300],
             "y": [2.611, 2.381, 2.329]},
        ],
    },
    "topk": {
        "xlabel": "top-k", "ylabel": "FID",
        "series": [{"label": "FID",
                    "x": [16384, 10000, 8000, 6000, 4000, 2000, 1000],
                    "y": [3.075, 3.369, 3.643, 3.969, 4.635, 5.998, 7.428]}],
        "y2": {"label": "Inception Score",
               "x": [16384, 10000, 8000, 6000, 4000, 2000, 1000],
               "y": [256.067, 265.222, 268.237, 270.159, 271.455, 267.278,
                     251.268]},
    },
    "cfg": {
        "xlabel": "cfg", "ylabel": "FID",
        "series": [{"label": "FID", "x": [1.5, 1.75, 2.0, 2.25],
                    "y": [4.743, 3.151, 3.075, 3.620]}],
        "y2": {"label": "Inception Score", "x": [1.5, 1.75, 2.0, 2.25],
               "y": [165.381, 214.152, 256.067, 291.695]},
    },
}


def plot_series(data: dict, out_path: str, font_size: int = 14) -> None:
    """Render one line chart (optional twin y-axis) to out_path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(6, 4))
    ax1.set_xlabel(data.get("xlabel", "x"), fontsize=font_size)
    ax1.set_ylabel(data.get("ylabel", "y"), fontsize=font_size)
    for s in data["series"]:
        ax1.plot(s["x"], s["y"], "o-", label=s["label"])
    y2 = data.get("y2")
    if y2 is not None:
        ax2 = ax1.twinx()
        ax2.set_ylabel(y2["label"], fontsize=font_size)
        ax2.plot(y2["x"], y2["y"], "s--", color="brown", label=y2["label"])
        fig.legend(loc="upper right", bbox_to_anchor=(1.0, 1.0),
                   bbox_transform=ax1.transAxes, fontsize=font_size - 2)
    elif len(data["series"]) > 1:
        ax1.legend(loc="upper right", framealpha=0.5, fontsize=font_size - 2)
    fig.tight_layout()
    fig.savefig(out_path, dpi=200)
    plt.close(fig)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", nargs="?", default=None,
                   help=f"one of {sorted(DATASETS)} (omit with --data)")
    p.add_argument("out", help="output image path (.png)")
    p.add_argument("--data", default=None, help="JSON file of measured series")
    args = p.parse_args(argv)
    if args.data:
        with open(args.data) as f:
            data = json.load(f)
    else:
        if args.dataset not in DATASETS:
            p.error(f"dataset must be one of {sorted(DATASETS)}")
        data = DATASETS[args.dataset]
    plot_series(data, args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
