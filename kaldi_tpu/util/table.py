"""The ark/scp table system.

Parity with util/kaldi-table.h: keyed, ordered streams of typed objects
addressed by *rspecifiers* (read) and *wspecifiers* (write):

  rspecifiers:  "ark:foo.ark", "scp:foo.scp", "ark:-", "ark:gunzip -c f.gz|",
                with options  o (once), p (permissive), s (sorted),
                cs (called-sorted), t/b (text/binary hint), bg (background).
  wspecifiers:  "ark:foo.ark", "ark,t:-", "ark,scp:f.ark,f.scp", "scp:f.scp",
                with options  b/t (binary/text), f/nf (flush), p (permissive).

An archive entry is "<key><space>" followed by the object (prefixed with
the b"\\x00B" marker when binary). A script (scp) line is
"<key> <rxfilename>" where the rxfilename may carry a byte offset
("foo.ark:1234") — exactly the reference's format, so archives produced
here are readable by the reference tools and vice versa.
"""

from __future__ import annotations

import io
import os
import sys
from dataclasses import dataclass, field
from typing import BinaryIO, Dict, Iterator, Optional, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs
from kaldi_tpu.base.logging import KaldiTpuError, warn
from kaldi_tpu.util import kaldi_io


# ---------------------------------------------------------------------------
# Specifier parsing (ClassifyRspecifier/ClassifyWspecifier, kaldi-table.h:124,225)

@dataclass
class RspecifierOptions:
    once: bool = False
    sorted: bool = False
    called_sorted: bool = False
    permissive: bool = False
    background: bool = False


@dataclass
class WspecifierOptions:
    binary: bool = True
    flush: bool = False
    permissive: bool = False


def parse_rspecifier(rspecifier: str) -> Tuple[str, str, RspecifierOptions]:
    """Returns (kind in {'ark','scp'}, rxfilename, options)."""
    if ":" not in rspecifier:
        raise KaldiTpuError(f"invalid rspecifier {rspecifier!r}")
    prefix, rxfilename = rspecifier.split(":", 1)
    opts = RspecifierOptions()
    kind = None
    for part in prefix.split(","):
        if part in ("ark", "scp"):
            kind = part
        elif part == "o":
            opts.once = True
        elif part == "no":
            opts.once = False
        elif part == "p":
            opts.permissive = True
        elif part == "np":
            opts.permissive = False
        elif part == "s":
            opts.sorted = True
        elif part == "ns":
            opts.sorted = False
        elif part == "cs":
            opts.called_sorted = True
        elif part == "ncs":
            opts.called_sorted = False
        elif part == "bg":
            opts.background = True
        elif part in ("t", "b"):
            pass  # read path autodetects
        else:
            raise KaldiTpuError(f"invalid rspecifier option {part!r} in {rspecifier!r}")
    if kind is None:
        raise KaldiTpuError(f"invalid rspecifier {rspecifier!r}")
    return kind, rxfilename, opts


def parse_wspecifier(wspecifier: str) -> Tuple[str, str, Optional[str], WspecifierOptions]:
    """Returns (kind in {'ark','scp','ark,scp'}, archive_wxfilename,
    script_wxfilename, options)."""
    if ":" not in wspecifier:
        raise KaldiTpuError(f"invalid wspecifier {wspecifier!r}")
    prefix, rest = wspecifier.split(":", 1)
    parts = prefix.split(",")
    opts = WspecifierOptions()
    has_ark = "ark" in parts
    has_scp = "scp" in parts
    for part in parts:
        if part in ("ark", "scp"):
            continue
        elif part == "t":
            opts.binary = False
        elif part == "b":
            opts.binary = True
        elif part == "f":
            opts.flush = True
        elif part == "nf":
            opts.flush = False
        elif part == "p":
            opts.permissive = True
        else:
            raise KaldiTpuError(f"invalid wspecifier option {part!r} in {wspecifier!r}")
    if has_ark and has_scp:
        if "," not in rest:
            raise KaldiTpuError(f"ark,scp wspecifier needs two filenames: {wspecifier!r}")
        ark_name, scp_name = rest.split(",", 1)
        return "ark,scp", ark_name, scp_name, opts
    if has_ark:
        return "ark", rest, None, opts
    if has_scp:
        return "scp", rest, None, opts
    raise KaldiTpuError(f"invalid wspecifier {wspecifier!r}")


# ---------------------------------------------------------------------------
# Holders (util/kaldi-holder.h concept): how one value is read/written.

class Holder:
    """Interface: read(stream) -> value; write(stream, binary, value)."""

    #: if False, entries are always text and never get the \0B marker
    binary_container = True

    def read(self, stream: BinaryIO):
        raise NotImplementedError

    def write(self, stream: BinaryIO, binary: bool, value) -> None:
        raise NotImplementedError


class MatrixHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return io_funcs.read_matrix(stream, binary)

    def write(self, stream, binary, value):
        io_funcs.write_matrix(stream, binary, np.asarray(value))


class VectorHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return io_funcs.read_vector(stream, binary)

    def write(self, stream, binary, value):
        io_funcs.write_vector(stream, binary, np.asarray(value))


class CompressedMatrixHolder(Holder):
    """Writes CompressedMatrix ("CM" format); reads any matrix type."""

    def __init__(self, method: int = 1):
        self.method = method

    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return io_funcs.read_matrix(stream, binary)

    def write(self, stream, binary, value):
        from kaldi_tpu.matrix.compressed import write_compressed_matrix
        if not binary:
            raise KaldiTpuError("CompressedMatrix requires binary mode")
        write_compressed_matrix(stream, np.asarray(value), self.method)


class IntHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return io_funcs.read_int32(stream, binary)

    def write(self, stream, binary, value):
        io_funcs.write_int32(stream, binary, value)
        if not binary:
            stream.write(b"\n")


class FloatHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return io_funcs.read_float(stream, binary)

    def write(self, stream, binary, value):
        io_funcs.write_float(stream, binary, value)
        if not binary:
            stream.write(b"\n")


class BoolHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return io_funcs.read_bool(stream, binary)

    def write(self, stream, binary, value):
        io_funcs.write_bool(stream, binary, value)
        if not binary:
            stream.write(b"\n")


class IntVectorHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        if binary:
            return io_funcs.read_int_vector(stream, binary)
        # text: rest of line
        line = stream.readline().decode("utf-8")
        return [int(t) for t in line.split()]

    def write(self, stream, binary, value):
        if binary:
            io_funcs.write_int_vector(stream, binary, value)
        else:
            stream.write((" ".join(str(int(v)) for v in value) + "\n").encode())


class IntVectorVectorHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        if binary:
            n = io_funcs.read_int32(stream, binary)
            return [io_funcs.read_int_vector(stream, binary) for _ in range(n)]
        line = stream.readline().decode("utf-8")
        out, cur = [], []
        for tok in line.split():
            if tok == ";":
                out.append(cur)
                cur = []
            else:
                cur.append(int(tok))
        if cur:
            out.append(cur)
        return out

    def write(self, stream, binary, value):
        if binary:
            io_funcs.write_int32(stream, binary, len(value))
            for v in value:
                io_funcs.write_int_vector(stream, binary, v)
        else:
            stream.write((" ; ".join(" ".join(str(int(x)) for x in v)
                                     for v in value) + " ; \n").encode())


class IntPairVectorHolder(Holder):
    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        if binary:
            return io_funcs.read_int_pair_vector(stream, binary)
        line = stream.readline().decode("utf-8")
        toks = line.split()
        if len(toks) % 2:
            raise KaldiTpuError("bad int-pair-vector text entry")
        return [(int(toks[i]), int(toks[i + 1])) for i in range(0, len(toks), 2)]

    def write(self, stream, binary, value):
        if binary:
            io_funcs.write_int_pair_vector(stream, binary, value)
        else:
            stream.write((" ".join(f"{a} {b}" for a, b in value) + "\n").encode())


class TokenHolder(Holder):
    binary_container = False

    def read(self, stream):
        return io_funcs.read_token(stream, False)

    def write(self, stream, binary, value):
        stream.write(value.encode() + b"\n")


class TokenVectorHolder(Holder):
    """A line of whitespace-separated tokens (e.g. the `text` file)."""
    binary_container = False

    def read(self, stream):
        line = stream.readline().decode("utf-8")
        return line.split()

    def write(self, stream, binary, value):
        stream.write((" ".join(value) + "\n").encode())


class ObjectHolder(Holder):
    """Holder for any class exposing classmethod read(stream, binary) and
    method write(stream, binary) — models, lattices, FSTs, supervisions."""

    def __init__(self, cls):
        self.cls = cls

    def read(self, stream):
        binary = io_funcs.init_input_stream(stream)
        return self.cls.read(stream, binary)

    def write(self, stream, binary, value):
        value.write(stream, binary)


class WaveHolder(Holder):
    """RIFF wave entries (feat/wave-reader.h:158)."""

    def read(self, stream):
        from kaldi_tpu.feat.wave import WaveData
        # ark entries carry the \0B marker; raw .wav files (scp) start
        # with 'RIFF' and init_input_stream leaves them untouched
        io_funcs.init_input_stream(stream)
        return WaveData.read(stream)

    def write(self, stream, binary, value):
        if not binary:
            raise KaldiTpuError("wave data requires binary mode")
        value.write(stream)


_HOLDERS = {
    "matrix": MatrixHolder,
    "vector": VectorHolder,
    "compressed-matrix": CompressedMatrixHolder,
    "int": IntHolder,
    "float": FloatHolder,
    "bool": BoolHolder,
    "int-vector": IntVectorHolder,
    "int-vector-vector": IntVectorVectorHolder,
    "int-pair-vector": IntPairVectorHolder,
    "token": TokenHolder,
    "token-vector": TokenVectorHolder,
    "wave": WaveHolder,
}


def _make_holder(holder) -> Holder:
    if isinstance(holder, Holder):
        return holder
    if isinstance(holder, str):
        if holder == "posterior":  # lazy: avoids an import cycle
            from kaldi_tpu.hmm.posterior import PosteriorHolder
            return PosteriorHolder()
        if holder == "gauss-post":
            from kaldi_tpu.hmm.posterior import GaussPostHolder
            return GaussPostHolder()
        if holder == "lattice":
            from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
            return LatticeHolder()
        if holder == "fst":
            from kaldi_tpu.fstext.openfst_io import FstHolder
            return FstHolder()
        if holder == "sparse-matrix":
            from kaldi_tpu.matrix.sparse import SparseMatrixHolder
            return SparseMatrixHolder()
        return _HOLDERS[holder]()
    if isinstance(holder, type) and issubclass(holder, Holder):
        return holder()
    if isinstance(holder, type):
        return ObjectHolder(holder)
    raise KaldiTpuError(f"cannot make holder from {holder!r}")


# ---------------------------------------------------------------------------
# Readers / writer

class SequentialTableReader:
    """Iterate (key, value) in archive order (kaldi-table.h:287).

    `holder` is a holder name ("matrix", "int-vector", ...), a Holder
    instance, or a class with read/write methods.
    """

    def __init__(self, holder, rspecifier: str):
        self.holder = _make_holder(holder)
        self.kind, self.rxfilename, self.opts = parse_rspecifier(rspecifier)
        self._stream: Optional[BinaryIO] = None
        self._scp_lines: Optional[list] = None

    def __iter__(self) -> Iterator[Tuple[str, object]]:
        if self.kind == "ark":
            stream = kaldi_io.open_input(self.rxfilename)
            if not isinstance(stream, io.BufferedReader) and not hasattr(stream, "peek"):
                stream = io.BufferedReader(io.BytesIO(stream.read()))
            try:
                while True:
                    # tolerate inter-entry whitespace (text holders
                    # whose values end short of the newline, e.g. a
                    # float's single trailing space) before deciding
                    # whether the archive is exhausted
                    b = io_funcs.peek_byte(stream)
                    while b and b in b" \t\n\r":
                        stream.read(1)
                        b = io_funcs.peek_byte(stream)
                    if not b:
                        return
                    key = io_funcs.read_token(stream, True)
                    try:
                        value = self.holder.read(stream)
                    except Exception:
                        if self.opts.permissive:
                            warn(f"skipping bad entry for key {key}")
                            continue
                        raise
                    yield key, value
            finally:
                if stream is not sys.stdin.buffer:
                    stream.close()
        else:  # scp
            with kaldi_io.input_stream(self.rxfilename) as f:
                lines = f.read().decode("utf-8").splitlines()
            for line in lines:
                line = line.strip()
                if not line:
                    continue
                key, _, rxfilename = line.partition(" ")
                rxfilename = rxfilename.strip()
                try:
                    value = self._read_one(rxfilename)
                except Exception:
                    if self.opts.permissive:
                        warn(f"skipping unreadable scp entry {key} -> {rxfilename}")
                        continue
                    raise
                yield key, value

    def _read_one(self, rxfilename: str):
        f = kaldi_io.open_input(rxfilename)
        try:
            if not hasattr(f, "peek"):
                f = io.BufferedReader(f)  # type: ignore[arg-type]
            return self.holder.read(f)
        finally:
            if f is not sys.stdin.buffer:
                f.close()

    # Convenience: dict()-like materialization
    def as_dict(self) -> Dict[str, object]:
        return dict(iter(self))


class RandomAccessTableReader:
    """Random access by key (kaldi-table.h:233).

    scp sources open entries on demand (with a small cache); ark sources
    are preloaded into memory on first access.
    """

    def __init__(self, holder, rspecifier: str):
        self.holder = _make_holder(holder)
        self.kind, self.rxfilename, self.opts = parse_rspecifier(rspecifier)
        self._scp: Optional[Dict[str, str]] = None
        self._data: Optional[Dict[str, object]] = None
        self._cache: Dict[str, object] = {}
        self._lazy: Optional[Dict[str, tuple]] = None
        self._lazy_map = None

    def _ensure_loaded(self):
        if self.kind == "scp":
            if self._scp is None:
                self._scp = {}
                with kaldi_io.input_stream(self.rxfilename) as f:
                    for line in f.read().decode("utf-8").splitlines():
                        line = line.strip()
                        if not line:
                            continue
                        key, _, rx = line.partition(" ")
                        self._scp[key] = rx.strip()
        else:
            if self._data is None and self._lazy is None:
                # lazy fast path for plain binary matrix arks: a
                # native C++ scan builds a key -> (offset, shape)
                # index and payloads are viewed from one mmap ON
                # DEMAND — random access to a large ark no longer
                # materializes the whole archive in RAM (the
                # reference's RandomAccessTableReader streams from
                # disk for the same reason)
                if (isinstance(self.holder, MatrixHolder)
                        and kaldi_io.classify_rxfilename(
                            self.rxfilename) == "file"
                        and not self.rxfilename.endswith(".gz")):
                    from kaldi_tpu.native import ark_matrix_entries
                    entries = ark_matrix_entries(self.rxfilename)
                    if entries is not None:
                        self._lazy = {k: (off, r, c, dt)
                                      for k, off, r, c, dt in entries}
                        self._lazy_map = np.memmap(
                            self.rxfilename, dtype=np.uint8, mode="r")
                        return
            if self._data is None and self._lazy is None:
                reader = SequentialTableReader(self.holder, f"ark:{self.rxfilename}")
                self._data = reader.as_dict()

    def __contains__(self, key: str) -> bool:
        self._ensure_loaded()
        if self.kind == "scp":
            return key in self._scp  # type: ignore[operator]
        if self._lazy is not None:
            return key in self._lazy
        return key in self._data  # type: ignore[operator]

    def has_key(self, key: str) -> bool:
        return key in self

    def __getitem__(self, key: str):
        self._ensure_loaded()
        if self.kind == "scp":
            if key in self._cache:
                return self._cache[key]
            rx = self._scp.get(key)  # type: ignore[union-attr]
            if rx is None:
                raise KeyError(key)
            f = kaldi_io.open_input(rx)
            try:
                if not hasattr(f, "peek"):
                    f = io.BufferedReader(f)  # type: ignore[arg-type]
                value = self.holder.read(f)
            finally:
                f.close()
            if len(self._cache) > 16:
                self._cache.clear()
            self._cache[key] = value
            return value
        if self._lazy is not None:
            if key not in self._lazy:
                raise KeyError(key)
            off, r, c, dt = self._lazy[key]
            flat = self._lazy_map[off:off + r * c * dt.itemsize].view(dt)
            return np.ascontiguousarray(flat.reshape(r, c))
        if key not in self._data:  # type: ignore[operator]
            raise KeyError(key)
        return self._data[key]  # type: ignore[index]

    def value(self, key: str):
        return self[key]

    def keys(self):
        self._ensure_loaded()
        if self.kind == "scp":
            return self._scp.keys()  # type: ignore[union-attr]
        if self._lazy is not None:
            return self._lazy.keys()
        return self._data.keys()  # type: ignore[union-attr]


class RandomAccessTableReaderMapped:
    """RandomAccessTableReaderMapped (kaldi-table.h:432): looks up
    through a key map (classically utt2spk) when provided."""

    def __init__(self, holder, rspecifier: str, map_rspecifier: str = ""):
        self.reader = RandomAccessTableReader(holder, rspecifier)
        self.key_map: Optional[Dict[str, str]] = None
        if map_rspecifier:
            self.key_map = {
                k: v[0] for k, v in SequentialTableReader("token-vector",
                                                          map_rspecifier)
            }

    def _map(self, key: str) -> str:
        if self.key_map is None:
            return key
        if key not in self.key_map:
            raise KeyError(f"no map entry for {key}")
        return self.key_map[key]

    def __contains__(self, key):
        try:
            return self._map(key) in self.reader
        except KeyError:
            return False

    def __getitem__(self, key):
        return self.reader[self._map(key)]


class TableWriter:
    """Write (key, value) entries to ark / scp / ark,scp (kaldi-table.h:368)."""

    def __init__(self, holder, wspecifier: str):
        self.holder = _make_holder(holder)
        self.kind, self.ark_name, self.scp_name, self.opts = \
            parse_wspecifier(wspecifier)
        if self.kind == "scp":
            raise KaldiTpuError(
                "scp-only TableWriter is not supported (write ark,scp instead)")
        self._ark = kaldi_io.open_output(self.ark_name)
        self._scp = kaldi_io.open_output(self.scp_name) if self.scp_name else None
        self._ark_is_file = kaldi_io.classify_wxfilename(self.ark_name) == "file"
        if self._scp is not None and not self._ark_is_file:
            raise KaldiTpuError("ark,scp output requires a plain ark file path")
        self._closed = False

    def write(self, key: str, value) -> None:
        if self._closed:
            raise KaldiTpuError("TableWriter is closed")
        if not key or any(c.isspace() for c in key):
            raise KaldiTpuError(f"invalid table key {key!r}")
        binary = self.opts.binary and self.holder.binary_container
        self._ark.write(key.encode() + b" ")
        if self._scp is not None:
            offset = self._ark.tell()
            abspath = os.path.abspath(self.ark_name)
            self._scp.write(f"{key} {abspath}:{offset}\n".encode())
        if binary and self.holder.binary_container:
            self._ark.write(io_funcs.BINARY_MARKER)
        self.holder.write(self._ark, binary, value)
        if self.opts.flush:
            self._ark.flush()
            if self._scp is not None:
                self._scp.flush()

    __setitem__ = write

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._ark is not sys.stdout.buffer:
            self._ark.close()
        else:
            self._ark.flush()
        if self._scp is not None:
            self._scp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
