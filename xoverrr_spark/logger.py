"""Structured logging — parity with the reference's ``xoverrr.module.func``
logger naming (``/root/reference/src/xoverrr/logger.py:1-13``), with run_id
correlation left to callers."""

from __future__ import annotations

import logging


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(f"xoverrr_spark.{name}")
    if not logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger
