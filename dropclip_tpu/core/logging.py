"""Process-0-only logging (replaces the reference's loguru rank-0 sinks,
reference utils/misc.py:295-326)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import jax

_FMT = "%(asctime)s | %(levelname)-7s | %(name)s - %(message)s"


def setup_logger(name: str = "dropclip",
                 save_dir: Optional[str] = None,
                 filename: str = "train.log",
                 level: int = logging.INFO) -> logging.Logger:
    """Configure a logger that only emits on process 0 of a multi-host run."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger

    is_primary = jax.process_index() == 0
    if is_primary:
        sh = logging.StreamHandler(stream=sys.stderr)
        sh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(sh)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(save_dir, filename))
            fh.setFormatter(logging.Formatter(_FMT))
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
