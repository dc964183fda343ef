"""Extended-filename I/O.

Parity with util/kaldi-io.h (Input/Output, kaldi-io.h:124,190): an
"rxfilename"/"wxfilename" may be a plain path, "-" (stdin/stdout), a
pipe command ("gunzip -c foo.gz|" for input, "|gzip -c > foo.gz" for
output), or a path with a byte offset ("foo.ark:1234"). ".gz" paths are
additionally handled natively (the reference relies on shell gunzip).
"""

from __future__ import annotations

import gzip
import io
import os
import re
import subprocess
import sys
from contextlib import contextmanager
from typing import BinaryIO, Optional, Tuple

from kaldi_tpu.base.logging import KaldiTpuError


def classify_rxfilename(name: str) -> str:
    """Returns one of: 'standard', 'pipe', 'offset', 'file', 'none'."""
    if name == "" or name == "-":
        return "standard"
    if name.endswith("|"):
        return "pipe"
    if re.search(r":[0-9]+$", name) and not name.startswith("|"):
        return "offset"
    if name.startswith("|"):
        return "none"  # an output pipe is not readable
    return "file"


def classify_wxfilename(name: str) -> str:
    if name == "" or name == "-":
        return "standard"
    if name.startswith("|"):
        return "pipe"
    if name.endswith("|"):
        return "none"
    return "file"


class _PipeInput(io.BufferedReader):
    def __init__(self, cmd: str):
        self._proc = subprocess.Popen(cmd, shell=True, stdout=subprocess.PIPE)
        super().__init__(self._proc.stdout)

    def close(self):
        try:
            super().close()
        finally:
            rc = self._proc.wait()
            if rc not in (0, -13):  # tolerate SIGPIPE like the reference
                raise KaldiTpuError(f"input pipe command failed (status {rc})")


class _PipeOutput(io.BufferedWriter):
    def __init__(self, cmd: str):
        self._proc = subprocess.Popen(cmd, shell=True, stdin=subprocess.PIPE)
        super().__init__(self._proc.stdin)

    def close(self):
        try:
            super().close()
        finally:
            rc = self._proc.wait()
            if rc != 0:
                raise KaldiTpuError(f"output pipe command failed (status {rc})")


def open_input(rxfilename: str) -> BinaryIO:
    """Open an rxfilename for binary reading. Caller closes."""
    from kaldi_tpu.base.io_funcs import PeekableReader
    kind = classify_rxfilename(rxfilename)
    if kind == "standard":
        # wrap: BufferedReader.peek can return <n bytes mid-stream and
        # stdin is not seekable, so multi-byte peeks need the pushback
        # wrapper (base/io_funcs.PeekableReader).
        return PeekableReader(sys.stdin.buffer)
    if kind == "pipe":
        return PeekableReader(_PipeInput(rxfilename[:-1]))
    if kind == "offset":
        path, offset = rxfilename.rsplit(":", 1)
        f = _open_path_for_read(path)
        f.seek(int(offset))
        return f
    if kind == "file":
        return _open_path_for_read(rxfilename)
    raise KaldiTpuError(f"invalid rxfilename: {rxfilename!r}")


def _open_path_for_read(path: str) -> BinaryIO:
    if path.endswith(".gz"):
        return io.BufferedReader(gzip.open(path, "rb"))
    return open(path, "rb")


def open_output(wxfilename: str) -> BinaryIO:
    kind = classify_wxfilename(wxfilename)
    if kind == "standard":
        return sys.stdout.buffer
    if kind == "pipe":
        return _PipeOutput(wxfilename[1:])
    if kind == "file":
        if wxfilename.endswith(".gz"):
            return io.BufferedWriter(gzip.open(wxfilename, "wb"))
        return open(wxfilename, "wb")
    raise KaldiTpuError(f"invalid wxfilename: {wxfilename!r}")


@contextmanager
def input_stream(rxfilename: str):
    f = open_input(rxfilename)
    try:
        yield f
    finally:
        if getattr(f, "_raw", f) is not sys.stdin.buffer:
            f.close()


@contextmanager
def output_stream(wxfilename: str):
    f = open_output(wxfilename)
    try:
        yield f
    finally:
        if f is not sys.stdout.buffer:
            f.close()
        else:
            f.flush()


def read_kaldi_object(read_fn, rxfilename: str):
    """ReadKaldiObject equivalent (kaldi-io.h:239): header-detect + read."""
    from kaldi_tpu.base import io_funcs
    with input_stream(rxfilename) as f:
        binary = io_funcs.init_input_stream(f)
        return read_fn(f, binary)


def write_kaldi_object(write_fn, wxfilename: str, binary: bool = True):
    from kaldi_tpu.base import io_funcs
    with output_stream(wxfilename) as f:
        io_funcs.init_output_stream(f, binary)
        write_fn(f, binary)
