"""Rank-0 logging + step metrics (ref utils/logger.py:4-19 surface)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax


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
