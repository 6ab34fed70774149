"""Rank-0 logging + step metrics (ref utils/logger.py:4-19 surface)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax


class MetricsWriter:
    """Append-only JSONL metrics stream (the TensorBoard-writer analog,
    ref dataset/utils/utils.py:228-252 — greppable without TF)."""

    def __init__(self, logging_dir: str, name: str = "metrics.jsonl"):
        os.makedirs(logging_dir, exist_ok=True)
        self._path = os.path.join(logging_dir, name)
        self._active = jax.process_index() == 0

    def write(self, step: int, **metrics):
        if not self._active:
            return
        import json
        import time as _time
        rec = {"step": int(step), "time": _time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def create_logger(logging_dir: Optional[str] = None,
                  name: str = "video_llamagen_tpu") -> logging.Logger:
    """stdout + log.txt logger on process 0; silent elsewhere
    (ref utils/logger.py)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    if jax.process_index() == 0:
        fmt = logging.Formatter("[%(asctime)s] %(message)s",
                                datefmt="%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir:
            os.makedirs(logging_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(logging_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
