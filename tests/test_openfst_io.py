"""OpenFst binary format round trips (standard, lattice, compact
lattice) and holder auto-detection."""

import io
import struct

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import (Arc, LatticeWeight, TropicalWeight,
                                  VectorFst)
from kaldi_tpu.fstext.openfst_io import (FST_MAGIC, read_fst, write_fst,
                                         peek_is_openfst)
from kaldi_tpu.fstext.ops import equal_paths
from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lat.kaldi_lattice import LatticeHolder


def trop_fst():
    f = VectorFst(TropicalWeight)
    s = [f.add_state() for _ in range(3)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 2, 0.5, s[1]))
    f.add_arc(s[0], Arc(0, 0, 1.5, s[2]))
    f.add_arc(s[1], Arc(3, 3, 0.25, s[2]))
    f.set_final(s[2], 0.75)
    return f


def latt_fst():
    f = VectorFst(LatticeWeight)
    s = [f.add_state() for _ in range(3)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(10, 1, (0.5, 1.0), s[1]))
    f.add_arc(s[1], Arc(11, 2, (0.25, 0.5), s[2]))
    f.set_final(s[2], (0.1, 0.2))
    return f


class TestOpenFstIO:
    def test_tropical_roundtrip(self):
        f = trop_fst()
        buf = io.BytesIO()
        write_fst(buf, f)
        buf.seek(0)
        head = struct.unpack("<i", buf.read(4))[0]
        assert head == FST_MAGIC
        buf.seek(0)
        g = read_fst(io.BufferedReader(buf))
        assert equal_paths(f, g)

    def test_lattice_roundtrip(self):
        f = latt_fst()
        buf = io.BytesIO()
        write_fst(buf, f)
        buf.seek(0)
        g = read_fst(io.BufferedReader(buf))
        ali1, words1, c1 = lattice_best_path(f)
        ali2, words2, c2 = lattice_best_path(g)
        assert (ali1, words1) == (ali2, words2)
        assert c1 == pytest.approx(c2, abs=1e-5)  # f32 storage rounding

    def test_compact_lattice_roundtrip(self):
        f = latt_fst()
        buf = io.BytesIO()
        write_fst(buf, f, as_compact_lattice=True)
        buf.seek(0)
        g = read_fst(io.BufferedReader(buf))
        ali1, words1, c1 = lattice_best_path(f)
        ali2, words2, c2 = lattice_best_path(g)
        assert words1 == words2
        assert ali1 == ali2
        assert c1 == pytest.approx(c2, abs=1e-5)

    def test_holder_detects_openfst(self, tmp_path):
        from kaldi_tpu.util.table import SequentialTableReader, TableWriter
        from kaldi_tpu.base import io_funcs as iof
        # simulate a reference binary lattice archive entry:
        # key + \0B + openfst compactlattice
        ark = tmp_path / "lat.ark"
        with open(ark, "wb") as fh:
            fh.write(b"utt1 ")
            fh.write(iof.BINARY_MARKER)
            write_fst(fh, latt_fst(), as_compact_lattice=True)
        got = dict(SequentialTableReader(LatticeHolder(), f"ark:{ark}"))
        assert "utt1" in got
        _, words, _ = lattice_best_path(got["utt1"])
        assert words == [1, 2]

    def test_read_fst_file_formats(self, tmp_path):
        from kaldi_tpu.fstext.openfst_io import read_fst_file
        from kaldi_tpu.util import kaldi_io
        f = trop_fst()
        # openfst binary
        p1 = tmp_path / "a.fst"
        with open(p1, "wb") as fh:
            write_fst(fh, f)
        assert equal_paths(read_fst_file(str(p1)), f)
        # KtFst container
        p2 = tmp_path / "b.fst"
        kaldi_io.write_kaldi_object(f.write, str(p2))
        assert equal_paths(read_fst_file(str(p2)), f)
        # text
        p3 = tmp_path / "c.txt"
        p3.write_text(f.to_text())
        assert equal_paths(read_fst_file(str(p3)), f)
