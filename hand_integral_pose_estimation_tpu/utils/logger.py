"""Coloured console + file logger (equivalent of common/logger.py:16-34)."""

from __future__ import annotations

import logging
import os
import sys

_COLORS = {
    logging.DEBUG: "\033[37m",
    logging.INFO: "\033[32m",
    logging.WARNING: "\033[33m",
    logging.ERROR: "\033[31m",
    logging.CRITICAL: "\033[41m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if sys.stderr.isatty() else msg


def color_logger(log_dir: str | None = None,
                 log_name: str = "train_logs.txt",
                 name: str = "hipe") -> logging.Logger:
    """Console (ANSI-coloured when a TTY) + append-mode file handler."""
    logger = logging.getLogger(f"{name}:{log_name}")
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False

    fmt = "%(asctime)s %(levelname)s %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(_ColorFormatter(fmt, datefmt="%H:%M:%S"))
    logger.addHandler(sh)

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, log_name), mode="a")
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    return logger
