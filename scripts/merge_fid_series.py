"""Merge GPT-B/GPT-L FID-vs-steps points from quality_table.json into the
2-series results_quality/fid_vs_steps.json + PNG (the reference's B/L/XL
FID-vs-epochs scaling figure, tools/draw_figure.py:6-12 — ours plots
rFID-random vs steps for two model sizes on the SAME VQ-8 codes).

CPU-only; safe to run any time — skips series with no recorded points.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results_quality")

# series label -> {step: candidate quality_table keys (first hit wins)}
SERIES = [
    ("GPT-B c2i 64px (own VQ-8 codes)",
     {100: ("gpt_step100", "gpt100_step100"), 1000: ("gpt_step1000",),
      3000: ("gpt_step3000",), 6000: ("gpt_step6000",)}),
    ("GPT-L c2i 64px (same VQ-8 codes)",
     {100: ("gptL100_step100", "gptL_step100"), 1000: ("gptL_step1000",),
      3000: ("gptL_step3000",), 6000: ("gptL_step6000",)}),
]


def main():
    with open(f"{ROOT}/quality_table.json") as f:
        table = json.load(f)

    series = []
    for label, points in SERIES:
        xs, ys = [], []
        for step, keys in sorted(points.items()):
            key = next((k for k in keys
                        if k in table and "fid" in table[k]), None)
            if key:
                xs.append(step)
                ys.append(table[key]["fid"])
        if xs:
            series.append({"label": label, "x": xs, "y": ys})
        else:
            print(f"no points yet for series {label!r}; skipping")

    data = {"xlabel": "training steps",
            "ylabel": "rFID-random (ADM evaluator)",
            "series": series}
    with open(f"{ROOT}/fid_vs_steps.json", "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {ROOT}/fid_vs_steps.json with {len(series)} series")

    from video_llamagen_tpu.tools import draw_figure
    draw_figure.main(["--data", f"{ROOT}/fid_vs_steps.json",
                      f"{ROOT}/fid_vs_steps.png"])


if __name__ == "__main__":
    sys.exit(main())
