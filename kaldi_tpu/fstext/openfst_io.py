"""OpenFst binary VectorFst read/write.

Byte-level interop with the reference's graph and lattice files
(fstext/kaldi-fst-io.h; HCLG.fst, L.fst, G.fst, binary lattice
archives). Supported arc types: "standard" (tropical), "lattice4"
(Kaldi LatticeWeight), "compactlattice44" (expanded to Lattice form on
read). FSTs with attached symbol tables are rejected with a clear
error (the reference's decoding graphs never attach them).

Layout (OpenFst FstHeader + VectorFst v2 body, little-endian):
  int32 magic=2125659606; string fsttype; string arctype;
  int32 version; int32 flags; uint64 properties;
  int64 start; int64 numstates; int64 numarcs;
  then per state: final weight, int64 narcs,
  arcs = {int32 ilabel, int32 olabel, weight, int32 nextstate}.
Strings are int32 length + bytes; weights: 1 float (standard),
2 floats (lattice4), 2 floats + int32 n + n*int32 (compactlattice44).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError
from kaldi_tpu.fstext.fst import (EPS, INF, Arc, LatticeWeight,
                                  TropicalWeight, VectorFst)

FST_MAGIC = 2125659606
_HAS_ISYMBOLS = 0x1
_HAS_OSYMBOLS = 0x2


def _read_string(f: BinaryIO) -> str:
    n = struct.unpack("<i", f.read(4))[0]
    return f.read(n).decode("utf-8")


def _write_string(f: BinaryIO, s: str) -> None:
    f.write(struct.pack("<i", len(s)))
    f.write(s.encode("utf-8"))


def read_fst_file(rxfilename: str) -> VectorFst:
    """Read an FST file in either raw OpenFst binary format (the
    reference's .fst files), our KtFst container (with the Kaldi \\0B
    header), or OpenFst text format."""
    import io as _io

    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.util import kaldi_io
    with kaldi_io.input_stream(rxfilename) as f:
        if not hasattr(f, "peek"):
            f = _io.BufferedReader(f)  # type: ignore[arg-type]
        if peek_is_openfst(f):
            return read_fst(f)
        binary = iof.init_input_stream(f)
        if binary or iof.peek_token(f, binary) == "<KtFst>":
            return VectorFst.read(f, binary)
        return VectorFst.from_text(f.read().decode("utf-8"))


def peek_is_openfst(stream: BinaryIO) -> bool:
    if not hasattr(stream, "peek"):
        return False
    from kaldi_tpu.base.io_funcs import peek_bytes
    head = peek_bytes(stream, 4)
    return len(head) == 4 and struct.unpack("<i", head)[0] == FST_MAGIC


def read_fst(stream: BinaryIO) -> VectorFst:
    magic = struct.unpack("<i", stream.read(4))[0]
    if magic != FST_MAGIC:
        raise KaldiTpuError(f"bad OpenFst magic {magic}")
    fsttype = _read_string(stream)
    arctype = _read_string(stream)
    version = struct.unpack("<i", stream.read(4))[0]
    flags = struct.unpack("<i", stream.read(4))[0]
    _props = struct.unpack("<Q", stream.read(8))[0]
    start = struct.unpack("<q", stream.read(8))[0]
    numstates = struct.unpack("<q", stream.read(8))[0]
    _numarcs = struct.unpack("<q", stream.read(8))[0]
    if fsttype not in ("vector", "const"):
        raise KaldiTpuError(f"unsupported FST type {fsttype!r}")
    if fsttype == "const":
        raise KaldiTpuError("const FSTs not yet supported; use fstconvert")
    if flags & (_HAS_ISYMBOLS | _HAS_OSYMBOLS):
        raise KaldiTpuError("FSTs with attached symbol tables unsupported")

    compact = False
    if arctype == "standard":
        sr = TropicalWeight
        wsize = 1
    elif arctype == "lattice4":
        sr = LatticeWeight
        wsize = 2
    elif arctype == "compactlattice44":
        sr = LatticeWeight
        wsize = 2
        compact = True
    else:
        raise KaldiTpuError(f"unsupported arc type {arctype!r}")

    def read_weight():
        vals = struct.unpack(f"<{wsize}f", stream.read(4 * wsize))
        string = None
        if compact:
            n = struct.unpack("<i", stream.read(4))[0]
            string = list(struct.unpack(f"<{n}i", stream.read(4 * n))) \
                if n else []
        return vals, string

    def to_w(vals):
        if wsize == 1:
            return float(vals[0])
        return (float(vals[0]), float(vals[1]))

    fst = VectorFst(sr)
    fst.add_states(max(numstates, 0))
    fst.start = int(start)
    for s in range(numstates):
        fvals, fstring = read_weight()
        w = to_w(fvals)
        is_zero = (w == INF if wsize == 1
                   else (w[0] == np.float32(INF) or w[0] == float("inf")))
        # OpenFst writes Zero() for non-final; tropical/lattice zero = +inf
        if wsize == 1:
            fst.finals[s] = w if w != float("inf") else TropicalWeight.zero
        else:
            fst.finals[s] = (w if w[0] != float("inf")
                             else LatticeWeight.zero)
        if compact and fstring:
            # append final string as epsilon arcs to a fresh final state
            cur = s
            lw = fst.finals[s]
            fst.finals[s] = LatticeWeight.zero
            for i, tid in enumerate(fstring):
                ns = fst.add_state()
                arc_w = lw if i == 0 else LatticeWeight.one
                fst.add_arc(cur, Arc(tid, EPS, arc_w, ns))
                cur = ns
            fst.finals[cur] = LatticeWeight.one if fstring else lw
        narcs = struct.unpack("<q", stream.read(8))[0]
        for _ in range(narcs):
            il, ol = struct.unpack("<ii", stream.read(8))
            vals, string = read_weight()
            (ns,) = struct.unpack("<i", stream.read(4))
            w = to_w(vals)
            if compact:
                # compact: il == ol == word; expand tid string
                word = il
                tids = string or []
                if not tids:
                    fst.add_arc(s, Arc(EPS, word, w, ns))
                else:
                    cur = s
                    for i, tid in enumerate(tids):
                        last = i == len(tids) - 1
                        nxt = ns if last else fst.add_state()
                        fst.add_arc(cur, Arc(
                            tid, word if i == 0 else EPS,
                            w if i == 0 else LatticeWeight.one, nxt))
                        cur = nxt
            else:
                fst.add_arc(s, Arc(il, ol, w, ns))
    return fst


def write_fst(stream: BinaryIO, fst: VectorFst,
              as_compact_lattice: bool = False) -> None:
    if fst.semiring is TropicalWeight:
        arctype, wsize = "standard", 1
    elif fst.semiring is LatticeWeight:
        arctype, wsize = ("compactlattice44" if as_compact_lattice
                          else "lattice4"), 2
    else:
        raise KaldiTpuError("unsupported semiring for OpenFst write")
    if as_compact_lattice:
        _write_compact(stream, fst)
        return
    stream.write(struct.pack("<i", FST_MAGIC))
    _write_string(stream, "vector")
    _write_string(stream, arctype)
    stream.write(struct.pack("<i", 2))      # version
    stream.write(struct.pack("<i", 0))      # flags
    stream.write(struct.pack("<Q", 0))      # properties
    stream.write(struct.pack("<q", fst.start))
    stream.write(struct.pack("<q", fst.num_states))
    stream.write(struct.pack("<q", fst.num_arcs()))

    def write_w(w):
        if wsize == 1:
            v = w if w != TropicalWeight.zero else float("inf")
            stream.write(struct.pack("<f", v))
        else:
            if w == LatticeWeight.zero:
                stream.write(struct.pack("<2f", float("inf"), float("inf")))
            else:
                stream.write(struct.pack("<2f", w[0], w[1]))

    for s in range(fst.num_states):
        write_w(fst.finals[s])
        stream.write(struct.pack("<q", len(fst.arcs[s])))
        for a in fst.arcs[s]:
            stream.write(struct.pack("<ii", a.ilabel, a.olabel))
            write_w(a.weight)
            stream.write(struct.pack("<i", a.nextstate))


def _write_compact(stream: BinaryIO, lat: VectorFst) -> None:
    """Write a Lattice as compactlattice44 (word-level acceptor with tid
    strings). The lattice is first converted to compact form."""
    from kaldi_tpu.lat.kaldi_lattice import lattice_to_compact
    write_compact_fst(stream, lattice_to_compact(lat))


def write_compact_fst(stream: BinaryIO, clat) -> None:
    """Write an actual CompactLattice as OpenFst compactlattice44,
    preserving its arc grouping (one arc's string stays one arc)."""
    stream.write(struct.pack("<i", FST_MAGIC))
    _write_string(stream, "vector")
    _write_string(stream, "compactlattice44")
    stream.write(struct.pack("<i", 2))
    stream.write(struct.pack("<i", 0))
    stream.write(struct.pack("<Q", 0))
    stream.write(struct.pack("<q", clat.start))
    stream.write(struct.pack("<q", clat.num_states))
    stream.write(struct.pack("<q", clat.num_arcs()))

    def write_cw(w):
        lw, string = w
        if string is None:
            stream.write(struct.pack("<2f", float("inf"), float("inf")))
            stream.write(struct.pack("<i", 0))
        else:
            stream.write(struct.pack("<2f", lw[0], lw[1]))
            stream.write(struct.pack("<i", len(string)))
            if string:
                stream.write(struct.pack(f"<{len(string)}i", *string))

    for s in range(clat.num_states):
        write_cw(clat.finals[s])
        stream.write(struct.pack("<q", len(clat.arcs[s])))
        for a in clat.arcs[s]:
            stream.write(struct.pack("<ii", a.ilabel, a.olabel))
            write_cw(a.weight)
            stream.write(struct.pack("<i", a.nextstate))


from kaldi_tpu.util.table import Holder as _TableHolder  # noqa: E402


class FstHolder(_TableHolder):
    """Table holder for archives of OpenFst-binary FSTs (the
    reference's VectorFstHolder — fstext/kaldi-fst-io.h): entries are
    raw OpenFst binary after the \\0B marker (fsts-concat / fsts-union
    / transcripts-to-fsts archives)."""

    binary_container = True

    def read(self, stream):
        from kaldi_tpu.base import io_funcs as iof
        iof.init_input_stream(stream)
        return read_fst(stream)

    def write(self, stream, binary, value):
        if not binary:
            raise KaldiTpuError("FST tables require binary mode")
        write_fst(stream, value)


def read_compact_fst(stream: BinaryIO):
    """Read OpenFst compactlattice44 into a CompactLattice, preserving
    per-arc tid strings (read_fst expands them instead)."""
    from kaldi_tpu.lat.kaldi_lattice import (CompactLattice,
                                             CompactLatticeWeight)
    magic = struct.unpack("<i", stream.read(4))[0]
    if magic != FST_MAGIC:
        raise KaldiTpuError(f"bad OpenFst magic {magic}")
    fsttype = _read_string(stream)
    arctype = _read_string(stream)
    _version = struct.unpack("<i", stream.read(4))[0]
    flags = struct.unpack("<i", stream.read(4))[0]
    _props = struct.unpack("<Q", stream.read(8))[0]
    start = struct.unpack("<q", stream.read(8))[0]
    numstates = struct.unpack("<q", stream.read(8))[0]
    _numarcs = struct.unpack("<q", stream.read(8))[0]
    if fsttype != "vector" or arctype != "compactlattice44":
        raise KaldiTpuError(
            f"read_compact_fst: got {fsttype}/{arctype}")
    if flags & (_HAS_ISYMBOLS | _HAS_OSYMBOLS):
        raise KaldiTpuError("FSTs with attached symbol tables unsupported")
    clat = CompactLattice()
    clat.add_states(max(numstates, 0))
    clat.start = int(start)

    def read_cw():
        g, a = struct.unpack("<2f", stream.read(8))
        n = struct.unpack("<i", stream.read(4))[0]
        tids = tuple(struct.unpack(f"<{n}i", stream.read(4 * n))) \
            if n else ()
        if g == float("inf"):
            return CompactLatticeWeight.zero
        return ((float(g), float(a)), tids)

    for s in range(numstates):
        clat.finals[s] = read_cw()
        narcs = struct.unpack("<q", stream.read(8))[0]
        for _ in range(narcs):
            il, ol = struct.unpack("<ii", stream.read(8))
            w = read_cw()
            (ns,) = struct.unpack("<i", stream.read(4))
            clat.add_arc(s, Arc(il, ol, w, ns))
    return clat
