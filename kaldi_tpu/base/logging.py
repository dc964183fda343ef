"""Error/logging layer.

Capability parity with the reference's base/kaldi-error.h (KALDI_ERR /
KALDI_WARN / KALDI_LOG / KALDI_VLOG macros and SetVerboseLevel): leveled
stderr logging with file:line attribution and a raisable error type.
"""

from __future__ import annotations

import inspect
import os
import sys
import time

_verbose_level = 0
_program_name = ""


class KaldiTpuError(RuntimeError):
    """Fatal error (parity: KaldiFatalError, base/kaldi-error.h:89)."""


def set_program_name(name: str) -> None:
    global _program_name
    _program_name = os.path.basename(name)


def set_verbose_level(level: int) -> None:
    global _verbose_level
    _verbose_level = int(level)


def get_verbose_level() -> int:
    return _verbose_level


def _caller(depth: int = 2) -> str:
    frame = inspect.stack()[depth]
    return f"{os.path.basename(frame.filename)}:{frame.lineno}"


def _emit(tag: str, msg: str, depth: int = 3) -> None:
    prog = _program_name or os.path.basename(sys.argv[0] or "python")
    print(f"{tag} ({prog}[{time.strftime('%H:%M:%S')}]:{_caller(depth)}) {msg}",
          file=sys.stderr, flush=True)


def log(msg: str) -> None:
    _emit("LOG", msg)


def vlog(level: int, msg: str) -> None:
    if _verbose_level >= level:
        _emit(f"VLOG[{level}]", msg)


def warn(msg: str) -> None:
    _emit("WARNING", msg)


def error(msg: str):
    """Log and raise. Usage: `raise error_exc(msg)` or just call (raises)."""
    _emit("ERROR", msg)
    raise KaldiTpuError(msg)
