"""Logging: the rxi/log.c equivalent (`slam/thirdparty/log.{h,cpp}`).

The reference vendors a C logger with six levels TRACE..FATAL
(`log.h:36-44`), `log_<level>` macros capturing file/line (`log.h:46-53`),
a global level filter (`log.cpp:114`) and up to 32 file sinks
(`log.cpp:126-143`). Python's stdlib logging already provides filtering,
handlers, and file/line capture; this module just standardizes the format
(level, time, file:line — the rxi layout) and adds the TRACE level.
"""

from __future__ import annotations

import logging
import sys

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_FMT = "%(asctime)s %(levelname)-5s %(filename)s:%(lineno)d: %(message)s"
_DATEFMT = "%H:%M:%S"


def get_logger(name: str = "slam_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT, _DATEFMT))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def set_level(level, name: str = "slam_tpu") -> None:
    """`log_set_level` equivalent (`slam/thirdparty/log.cpp:114`)."""
    logging.getLogger(name).setLevel(level)


def add_file_sink(path: str, level=TRACE, name: str = "slam_tpu") -> None:
    """`log_add_fp` equivalent (`slam/thirdparty/log.cpp:126-143`)."""
    h = logging.FileHandler(path)
    h.setLevel(level)
    h.setFormatter(logging.Formatter(_FMT, _DATEFMT))
    logging.getLogger(name).addHandler(h)


def trace(msg, *args, name: str = "slam_tpu"):
    logging.getLogger(name).log(TRACE, msg, *args, stacklevel=2)
