"""Leveled, module-tagged logging with console + file sinks.

The analog of the reference logging subsystem (`log.h`): levels
INFO/OKAY/WARN/ERROR/FATAL/DEBUG/TRACE (`log.h:8-18`), module tags,
indentation groups (`log.h:118-143`), ANSI-colored console plus an optional
per-run log file (`log.h:216-295`), and ``format_bytes`` (`log.h:352`).
"""
from __future__ import annotations

import os
import sys
import time
from typing import Optional, TextIO

LEVELS = ("TRACE", "DEBUG", "INFO", "OKAY", "WARN", "ERROR", "FATAL")
_RANK = {name: i for i, name in enumerate(LEVELS)}

_COLORS = {
    "TRACE": "\x1b[90m",
    "DEBUG": "\x1b[90m",
    "INFO": "",
    "OKAY": "\x1b[32m",
    "WARN": "\x1b[33m",
    "ERROR": "\x1b[31m",
    "FATAL": "\x1b[41m",
}
_RESET = "\x1b[0m"


class LogSystem:
    """Global sink registry; swap the file sink per run like the reference's
    ``log_system_set_logger`` (`main.cpp:279-281`)."""

    def __init__(self):
        # resolved at emit time so stream redirection (pytest capture, etc.)
        # is respected
        self.console: Optional[TextIO] = None
        self.file: Optional[TextIO] = None
        self.min_level = os.environ.get("BTPU_LOG_LEVEL", "INFO")
        self.indent = 0
        self.use_color = True

    def set_file(self, path: Optional[str]):
        if self.file is not None:
            self.file.close()
            self.file = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.file = open(path, "a")

    def emit(self, level: str, module: str, msg: str):
        if _RANK[level] < _RANK.get(self.min_level, 2):
            return
        pad = "> " * self.indent
        stamp = time.strftime("%H:%M:%S")
        line = f"{stamp} {level:5s} [{module}] {pad}{msg}"
        color = _COLORS.get(level, "") if self.use_color else ""
        console = self.console if self.console is not None else sys.stderr
        print(f"{color}{line}{_RESET if color else ''}", file=console)
        if self.file is not None:
            self.file.write(line + "\n")
            self.file.flush()


SYSTEM = LogSystem()


class Logger:
    def __init__(self, module: str):
        self.module = module

    def _log(self, level, msg):
        SYSTEM.emit(level, self.module, msg)

    def trace(self, msg):
        self._log("TRACE", msg)

    def debug(self, msg):
        self._log("DEBUG", msg)

    def info(self, msg):
        self._log("INFO", msg)

    def okay(self, msg):
        self._log("OKAY", msg)

    def warn(self, msg):
        self._log("WARN", msg)

    def error(self, msg):
        self._log("ERROR", msg)

    def fatal(self, msg):
        self._log("FATAL", msg)


def get_logger(module: str) -> Logger:
    return Logger(module)


def log_group():
    """Increase indent (reference ``log_group``, `log.h:141`)."""
    SYSTEM.indent += 1


def log_ungroup():
    SYSTEM.indent = max(0, SYSTEM.indent - 1)


class log_grouped:
    def __enter__(self):
        log_group()
        return self

    def __exit__(self, *a):
        log_ungroup()
        return False


def format_bytes(n: float) -> str:
    """Human bytes (reference `log.h:352`)."""
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.2f}{unit}" if unit != "B" else f"{int(n)}B"
        n /= 1024
    return f"{n:.2f}TB"
