"""Leveled engine logger (reference logger.js:10-28).

The reference installs a loglevel prefix plugin that prepends an ISO-8601
timestamp and a 6-char-padded level name to every record, with the level
taken from ``config.json:2`` (``logLevel``). Same surface here on stdlib
``logging``: ``setup_logger("info")`` configures the format, ``log`` is the
module-level logger the engine writes through.

    2020-05-12T12:34:56.123Z INFO   Sending 42 entities...

Levels accept the reference's loglevel names (trace/debug/info/warn/error/
silent); ``trace`` maps to DEBUG and ``silent`` disables output.
"""

from __future__ import annotations

import logging
import time

_LEVELS = {
    "trace": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "silent": logging.CRITICAL + 10,
}

log = logging.getLogger("entity_etl_spark")


class _IsoFormatter(logging.Formatter):
    # reference logger.js:20 — toISOString() is UTC with milliseconds
    converter = time.gmtime

    def formatTime(self, record, datefmt=None):  # noqa: N802 (logging API)
        base = time.strftime("%Y-%m-%dT%H:%M:%S", self.converter(record.created))
        return f"{base}.{int(record.msecs):03d}Z"

    def format(self, record):
        # loglevel method names, not Python's (WARN, not WARNING)
        record.levelname = {"WARNING": "WARN", "CRITICAL": "ERROR"}.get(
            record.levelname, record.levelname
        )
        return super().format(record)


def setup_logger(level: str = "info") -> logging.Logger:
    """Configure the engine logger (reference setupLogger, logger.js:10-13).

    Idempotent; returns the shared logger. Level names follow the
    reference's loglevel package."""
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            # LOG_LEVEL_NAME_MIN/MAX_LENGTH = 6 (logger.js:7-8)
            _IsoFormatter("%(asctime)s %(levelname)-6.6s %(message)s")
        )
        log.addHandler(handler)
        log.propagate = False
    log.setLevel(_LEVELS.get(level.lower(), logging.INFO))
    return log
