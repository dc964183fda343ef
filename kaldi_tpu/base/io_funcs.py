"""Kaldi-wire-format object I/O primitives.

Byte-level interoperability with the reference's on-disk formats
(base/io-funcs.h Read/WriteBasicType/Token; matrix/kaldi-matrix.cc:1382
Matrix::Write; matrix/kaldi-vector.cc Vector::Write), so that archives,
models and stats written by either implementation can be read by the
other. Binary streams open with the two-byte marker b"\\x00B".

This is the host-side codec layer: arrays are numpy; device transfer
happens in the compute layers.
"""

from __future__ import annotations

import io
import struct
from typing import BinaryIO, Iterable, List, Sequence

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError

BINARY_MARKER = b"\x00B"


# ---------------------------------------------------------------------------
# Stream header

def init_output_stream(stream: BinaryIO, binary: bool) -> None:
    if binary:
        stream.write(BINARY_MARKER)


class PeekableReader:
    """Binary reader wrapper whose peek(n) GUARANTEES n bytes (unless
    EOF), via read + pushback.

    BufferedReader.peek(n) returns only the currently buffered bytes
    when any remain — it can return 1 byte mid-stream — so multi-byte
    peeks on non-seekable streams (pipes, stdin) need this wrapper.
    kaldi_io.open_input applies it to pipe/stdin sources."""

    def __init__(self, raw: BinaryIO):
        self._raw = raw
        self._buf = b""

    def peek(self, n: int = 1) -> bytes:
        while len(self._buf) < n:
            chunk = self._raw.read(n - len(self._buf))
            if not chunk:
                break
            self._buf += chunk
        return self._buf

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            data = self._buf + self._raw.read()
            self._buf = b""
            return data
        take, self._buf = self._buf[:n], self._buf[n:]
        if len(take) < n:
            take += self._raw.read(n - len(take))
        return take

    def readline(self, limit: int = -1) -> bytes:
        if b"\n" in self._buf:
            i = self._buf.index(b"\n") + 1
            line, self._buf = self._buf[:i], self._buf[i:]
            return line
        line, self._buf = self._buf, b""
        return line + self._raw.readline(limit)

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def close(self) -> None:
        self._raw.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __getattr__(self, name):
        return getattr(self._raw, name)


def peek_bytes(stream: BinaryIO, n: int) -> bytes:
    """Peek n bytes without consuming; guaranteed to return n bytes
    unless the stream hits EOF first (see PeekableReader)."""
    peek = getattr(stream, "peek", None)
    if peek is not None:
        buf = peek(n)
        if len(buf) >= n or isinstance(stream, PeekableReader):
            return buf[:n]  # short PeekableReader peek = genuine EOF
        # BufferedReader with a partially drained buffer: peek will not
        # refill. Fall through to read+seek when possible.
        if not stream.seekable():
            return buf[:n]  # non-seekable and not wrapped: best effort
    pos = stream.tell()
    data = stream.read(n)
    stream.seek(pos)
    return data


def init_input_stream(stream: BinaryIO) -> bool:
    """Peek the stream; consume and return True if it is binary."""
    if hasattr(stream, "peek"):
        if peek_bytes(stream, 2) == BINARY_MARKER:
            stream.read(2)
            return True
        return False
    pos = stream.tell()
    head = stream.read(2)
    if head == BINARY_MARKER:
        return True
    stream.seek(pos)
    return False


# ---------------------------------------------------------------------------
# Tokens and basic types

def write_token(stream: BinaryIO, binary: bool, token: str) -> None:
    if " " in token or not token:
        raise KaldiTpuError(f"invalid token to write: {token!r}")
    stream.write(token.encode("utf-8") + b" ")


def read_token(stream: BinaryIO, binary: bool) -> str:
    """Read a whitespace-delimited token, consuming one trailing space/newline.

    Mirrors ReadToken (io-funcs.cc): leading whitespace is skipped (operator>>
    semantics) and exactly one terminating whitespace byte is consumed.
    """
    _skip_ws(stream)
    chars = bytearray()
    while True:
        c = stream.read(1)
        if not c:
            if chars:
                break
            raise KaldiTpuError("read_token: unexpected EOF")
        if c.isspace():
            break
        chars += c
    return chars.decode("utf-8")


def peek_token(stream: BinaryIO, binary: bool) -> str:
    if hasattr(stream, "peek"):
        buf = peek_bytes(stream, 64)
        s = buf.lstrip()
        end = 0
        while end < len(s) and not chr(s[end]).isspace():
            end += 1
        return s[:end].decode("utf-8")
    pos = stream.tell()
    try:
        tok = read_token(stream, binary)
    finally:
        stream.seek(pos)
    return tok


def expect_token(stream: BinaryIO, binary: bool, token: str) -> None:
    got = read_token(stream, binary)
    if got != token:
        raise KaldiTpuError(f"expected token {token!r}, got {got!r}")


def peek_byte(stream: BinaryIO) -> bytes:
    """Peek one byte without consuming (works on pipes via BufferedReader.peek)."""
    return peek_bytes(stream, 1)


def _skip_ws(stream: BinaryIO) -> None:
    while True:
        c = peek_byte(stream)
        if not c or not c.isspace():
            return
        stream.read(1)


_FMT = {4: "<i", 8: "<q"}


def write_int32(stream: BinaryIO, binary: bool, value: int) -> None:
    if binary:
        stream.write(b"\x04" + struct.pack("<i", int(value)))
    else:
        stream.write(f"{int(value)} ".encode())


def read_int32(stream: BinaryIO, binary: bool) -> int:
    if binary:
        size = stream.read(1)
        if size != b"\x04":
            raise KaldiTpuError(f"read_int32: bad size byte {size!r}")
        return struct.unpack("<i", stream.read(4))[0]
    return int(read_token(stream, binary))


def write_uint32(stream: BinaryIO, binary: bool, value: int) -> None:
    """Unsigned int32 basic type: the reference marks unsignedness
    with a NEGATIVE size byte (-4 = 0xfc; io-funcs-inl.h
    WriteBasicType's is_signed branch) — used by TableEventMap /
    WriteEventType / WriteBuildTreeStats sizes."""
    if binary:
        stream.write(b"\xfc" + struct.pack("<I", int(value)))
    else:
        stream.write(f"{int(value)} ".encode())


def read_uint32(stream: BinaryIO, binary: bool) -> int:
    if binary:
        size = stream.read(1)
        # lenient: accept the signed marker too (files written by
        # earlier versions of this repo used int32 here)
        if size == b"\xfc":
            return struct.unpack("<I", stream.read(4))[0]
        if size == b"\x04":
            return struct.unpack("<i", stream.read(4))[0]
        raise KaldiTpuError(f"read_uint32: bad size byte {size!r}")
    return int(read_token(stream, binary))


def write_int64(stream: BinaryIO, binary: bool, value: int) -> None:
    if binary:
        stream.write(b"\x08" + struct.pack("<q", int(value)))
    else:
        stream.write(f"{int(value)} ".encode())


def read_int64(stream: BinaryIO, binary: bool) -> int:
    if binary:
        size = stream.read(1)
        if size != b"\x08":
            raise KaldiTpuError(f"read_int64: bad size byte {size!r}")
        return struct.unpack("<q", stream.read(8))[0]
    return int(read_token(stream, binary))


def write_float(stream: BinaryIO, binary: bool, value: float) -> None:
    if binary:
        stream.write(b"\x04" + struct.pack("<f", float(value)))
    else:
        stream.write(_format_float(float(value)).encode() + b" ")


def read_float(stream: BinaryIO, binary: bool) -> float:
    if binary:
        size = stream.read(1)
        if size == b"\x04":
            return struct.unpack("<f", stream.read(4))[0]
        if size == b"\x08":
            return struct.unpack("<d", stream.read(8))[0]
        raise KaldiTpuError(f"read_float: bad size byte {size!r}")
    return float(read_token(stream, binary))


def write_double(stream: BinaryIO, binary: bool, value: float) -> None:
    if binary:
        stream.write(b"\x08" + struct.pack("<d", float(value)))
    else:
        stream.write(repr(float(value)).encode() + b" ")


read_double = read_float


def write_bool(stream: BinaryIO, binary: bool, value: bool) -> None:
    if binary:
        stream.write(b"T" if value else b"F")
    else:
        stream.write(b"T " if value else b"F ")


def read_bool(stream: BinaryIO, binary: bool) -> bool:
    if binary:
        c = stream.read(1)
    else:
        c = read_token(stream, binary).encode()
    if c == b"T":
        return True
    if c == b"F":
        return False
    raise KaldiTpuError(f"read_bool: bad byte {c!r}")


def _format_float(v: float) -> str:
    # Shortest round-trip repr, like ostream << float with default precision.
    return np.format_float_positional(np.float32(v), unique=True, trim="-")


# ---------------------------------------------------------------------------
# Integer vectors (e.g. alignments); format of WriteIntegerVector (io-funcs-inl.h)

def write_int_vector(stream: BinaryIO, binary: bool, values: Sequence[int]) -> None:
    values = [int(v) for v in values]
    if binary:
        stream.write(b"\x04" + struct.pack("<i", len(values)))
        stream.write(np.asarray(values, dtype="<i4").tobytes())
    else:
        stream.write(b"[ " + " ".join(str(v) for v in values).encode() + (b" ]\n" if values else b"]\n"))


def read_int_vector(stream: BinaryIO, binary: bool) -> List[int]:
    if binary:
        size = stream.read(1)
        if size != b"\x04":
            raise KaldiTpuError(f"read_int_vector: bad size byte {size!r}")
        n = struct.unpack("<i", stream.read(4))[0]
        return np.frombuffer(stream.read(4 * n), dtype="<i4").tolist()
    expect_token(stream, binary, "[")
    out: List[int] = []
    while True:
        tok = read_token(stream, binary)
        if tok == "]":
            return out
        out.append(int(tok))


def write_int_pair_vector(stream: BinaryIO, binary: bool,
                          pairs: Sequence[tuple]) -> None:
    if binary:
        stream.write(b"\x04" + struct.pack("<i", len(pairs)))
        arr = np.asarray(pairs, dtype="<i4").reshape(len(pairs), 2)
        stream.write(arr.tobytes())
    else:
        stream.write(b"[ ")
        for a, b in pairs:
            stream.write(f"({a} {b}) ".encode())
        stream.write(b"]\n")


def read_int_pair_vector(stream: BinaryIO, binary: bool) -> List[tuple]:
    if binary:
        size = stream.read(1)
        if size != b"\x04":
            raise KaldiTpuError("read_int_pair_vector: bad size byte")
        n = struct.unpack("<i", stream.read(4))[0]
        arr = np.frombuffer(stream.read(8 * n), dtype="<i4").reshape(n, 2)
        return [tuple(row) for row in arr.tolist()]
    expect_token(stream, binary, "[")
    out: List[tuple] = []
    while True:
        tok = read_token(stream, binary)
        if tok == "]":
            return out
        if not tok.startswith("("):
            raise KaldiTpuError(f"bad pair token {tok}")
        a = int(tok[1:])
        b_tok = read_token(stream, binary)
        if not b_tok.endswith(")"):
            raise KaldiTpuError(f"bad pair token {b_tok}")
        out.append((a, int(b_tok[:-1])))


# ---------------------------------------------------------------------------
# Matrices / vectors (float32 "FM"/"FV", float64 "DM"/"DV")

def write_matrix(stream: BinaryIO, binary: bool, mat: np.ndarray) -> None:
    mat = np.atleast_2d(np.asarray(mat))
    if binary:
        if mat.dtype == np.float64:
            token, dt = "DM", "<f8"
        else:
            token, dt = "FM", "<f4"
            mat = mat.astype(np.float32, copy=False)
        write_token(stream, binary, token)
        write_int32(stream, binary, mat.shape[0])
        write_int32(stream, binary, mat.shape[1])
        stream.write(np.ascontiguousarray(mat, dtype=dt).tobytes())
    else:
        if mat.shape[1] == 0:
            stream.write(b" [ ]\n")
            return
        stream.write(b" [")
        for row in mat:
            stream.write(b"\n  " + " ".join(_format_float(v) for v in row).encode() + b" ")
        stream.write(b"]\n")


def read_matrix(stream: BinaryIO, binary: bool) -> np.ndarray:
    if binary:
        tok = read_token(stream, binary)
        if tok == "CM" or tok == "CM2" or tok == "CM3":
            from kaldi_tpu.matrix.compressed import read_compressed_matrix_body
            return read_compressed_matrix_body(stream, tok)
        if tok not in ("FM", "DM"):
            raise KaldiTpuError(f"read_matrix: bad token {tok!r}")
        dt = "<f4" if tok == "FM" else "<f8"
        rows = read_int32(stream, binary)
        cols = read_int32(stream, binary)
        data = stream.read(rows * cols * (4 if tok == "FM" else 8))
        return np.frombuffer(data, dtype=dt).reshape(rows, cols).copy()
    # Text format: " [ \n r0... \n r1... ]".  Tokens are scanned
    # manually (never consuming the delimiter) so a row break is
    # detected whether or not the row has a trailing space before its
    # newline (the reference writer emits one; hand-written files may
    # not).
    expect_token(stream, binary, "[")
    rows: List[List[float]] = []
    cur: List[float] = []
    # NB: pushback via peek_byte (not tell/seek) so the scan also works on
    # non-seekable PeekableReader-wrapped pipes, whose logical position is
    # behind the raw stream's whenever peeked bytes are buffered.
    while True:
        saw_nl = False
        while True:                       # skip whitespace, note \n
            c = peek_byte(stream)
            if not c:
                raise KaldiTpuError("read_matrix: unexpected EOF")
            if not c.isspace():
                break
            if c == b"\n":
                saw_nl = True
            stream.read(1)
        if saw_nl and cur:
            rows.append(cur)
            cur = []
        chars = bytearray()               # read token, keep delimiter
        while True:
            c = peek_byte(stream)
            if not c or c.isspace():
                break
            chars += stream.read(1)
        tok = chars.decode("utf-8")
        if tok == "]":
            if (peek_byte(stream) or b" ").isspace():
                stream.read(1)            # consume one trailing ws, if any
            if cur:
                rows.append(cur)
            break
        if tok.endswith("]"):             # "4]" — no space before close
            cur.append(float(tok[:-1]))
            if cur:
                rows.append(cur)
            break
        cur.append(float(tok))
    if not rows:
        return np.zeros((0, 0), dtype=np.float32)
    ncol = len(rows[0])
    if any(len(r) != ncol for r in rows):
        raise KaldiTpuError("read_matrix: ragged text matrix")
    return np.asarray(rows, dtype=np.float32)


def write_vector(stream: BinaryIO, binary: bool, vec: np.ndarray) -> None:
    vec = np.asarray(vec).reshape(-1)
    if binary:
        if vec.dtype == np.float64:
            token, dt = "DV", "<f8"
        else:
            token, dt = "FV", "<f4"
            vec = vec.astype(np.float32, copy=False)
        write_token(stream, binary, token)
        write_int32(stream, binary, vec.shape[0])
        stream.write(np.ascontiguousarray(vec, dtype=dt).tobytes())
    else:
        stream.write(b" [ " + " ".join(_format_float(v) for v in vec).encode() + b" ]\n")


def read_vector(stream: BinaryIO, binary: bool) -> np.ndarray:
    if binary:
        tok = read_token(stream, binary)
        if tok not in ("FV", "DV"):
            raise KaldiTpuError(f"read_vector: bad token {tok!r}")
        dt = "<f4" if tok == "FV" else "<f8"
        dim = read_int32(stream, binary)
        return np.frombuffer(stream.read(dim * (4 if tok == "FV" else 8)),
                             dtype=dt).copy()
    expect_token(stream, binary, "[")
    vals: List[float] = []
    while True:
        tok = read_token(stream, binary)
        if tok == "]":
            return np.asarray(vals, dtype=np.float32)
        vals.append(float(tok))


# ---------------------------------------------------------------------------
# Whole-object convenience (ReadKaldiObject/WriteKaldiObject equivalents)

def object_to_bytes(write_fn, binary: bool = True) -> bytes:
    buf = io.BytesIO()
    init_output_stream(buf, binary)
    write_fn(buf, binary)
    return buf.getvalue()


def object_from_bytes(read_fn, data: bytes):
    buf = io.BytesIO(data)
    binary = init_input_stream(buf)
    return read_fn(buf, binary)
