"""Logging setup (stdlib; the reference uses loguru, unavailable here).

Mirrors the reference's conventions: tqdm-friendly console sink + optional
file sink (demo.py:141-151), rank-templated format for multi-process runs
(evaluate.py:32-41) using the JAX process index.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_FORMAT = "[%(asctime)s] [rank {rank}] %(levelname)s %(name)s: %(message)s"


def get_logger(
    name: str = "shapy_tpu",
    level: str = "INFO",
    log_file: Optional[str] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        # Already configured: still honour a newly-requested level /
        # file sink instead of silently dropping them (a bare
        # get_logger(__name__) at some module import would otherwise
        # permanently lock the logger's configuration).
        logger.setLevel(getattr(logging, level.upper(), logging.INFO))
        if log_file and not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(
                log_file)
            for h in logger.handlers
        ):
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            fh = logging.FileHandler(log_file)
            if logger.handlers[0].formatter is not None:
                fh.setFormatter(logger.handlers[0].formatter)
            logger.addHandler(fh)
        return logger
    try:
        import jax

        rank = jax.process_index()
    except Exception:
        rank = 0
    fmt = logging.Formatter(_FORMAT.format(rank=rank))
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.propagate = False
    return logger
