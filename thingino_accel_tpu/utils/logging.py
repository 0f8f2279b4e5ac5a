"""Structured logging.

The reference narrates through printf-with-fflush forensics everywhere
(SURVEY §5 observability). Here: a single stdlib logger, level from
TAT_LOG, quiet by default — the engine is a library.
"""

from __future__ import annotations

import logging
import os

_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO,
           "warn": logging.WARNING, "error": logging.ERROR}


def get_logger(name: str = "tat") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "[%(levelname).1s %(asctime)s %(name)s] %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(_LEVELS.get(
            os.environ.get("TAT_LOG", "warn").lower(), logging.WARNING))
        logger.propagate = False
    return logger
