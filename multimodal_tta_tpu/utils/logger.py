"""Framework logger.

Same logger shape as the reference (reference: src/utils/logger.py:13-79):
a named logger with console + optional file handler and a
``[time] name - LEVEL [file:line]`` record format, so downstream log parsing
is unchanged.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_DEFAULT_NAME = "multimodal_tta_tpu"
_FMT = "[%(asctime)s] %(name)s - %(levelname)s [%(filename)s:%(lineno)d] %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def setup_logger(
    log_file: Optional[str] = None,
    name: str = _DEFAULT_NAME,
    level: int = logging.INFO,
    to_console: bool = True,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False

    # Reset handlers so repeated setup (tests, sweeps) doesn't duplicate output.
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()

    formatter = logging.Formatter(_FMT, datefmt=_DATEFMT)

    if to_console:
        ch = logging.StreamHandler(sys.stdout)
        ch.setLevel(level)
        ch.setFormatter(formatter)
        logger.addHandler(ch)

    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, encoding="utf-8")
        fh.setLevel(level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    return logger


def get_logger(name: str = _DEFAULT_NAME) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        setup_logger(name=name)
    return logger


class LoggerWriter:
    """File-like adapter redirecting a stream (stdout/stderr) into a logger."""

    def __init__(self, logger: logging.Logger, level: int = logging.INFO):
        self.logger = logger
        self.level = level
        self._buf = ""

    def write(self, message: str) -> None:
        self._buf += message
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line.strip():
                self.logger.log(self.level, line.rstrip())

    def flush(self) -> None:
        if self._buf.strip():
            self.logger.log(self.level, self._buf.rstrip())
        self._buf = ""
